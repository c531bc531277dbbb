package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational coverage queries (SURVEY.md §2.6): aggregation, joins of
  * every flavor, windows, rollup, set ops — the surface the reference
  * lacks but a complete engine needs. Each has an exact DuckDB oracle.
  *
  * Determinism discipline for oracle hash-parity: money/double
  * aggregates are computed over `decimal`-cast columns (exact, order
  * independent in both engines), then rounded and cast back to double.
  * Plain double sums would differ in the last ulps between engines.
  */
object RelationalQueries {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary. */
  def q1PricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"),
        round(sum(dec("l_extendedprice")), 2).cast("double").as("sum_base_price"),
        round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String = """
SELECT l_returnflag, l_linestatus,
  round(sum(cast(l_quantity AS decimal(18,2))), 2)::double AS sum_qty,
  round(sum(cast(l_extendedprice AS decimal(18,2))), 2)::double AS sum_base_price,
  round(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))), 2)::double AS sum_disc_price,
  count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
}
