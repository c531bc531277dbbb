package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round-5 surface additions that the hash gate
  * cannot see (the cross-engine value check is the DuckDB gate at
  * sf0.01; these pin the properties a refactor could silently break).
  */
class SurfaceR5Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("text_hapax: hapax <= vocab <= tokens, ppm identity, and the " +
       "hapax count matches a direct frequency filter") {
    val rows = TextQueries.hapax(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tok, voc, hap) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("vocab"), r.getAs[Long]("hapax"))
      assert(hap <= voc && voc <= tok)
      assert(r.getAs[Long]("hapax_ppm") === hap * 1000000L / voc)
    }
    // direct recount for one source
    val src = rows.head.getAs[String]("source")
    val direct = Tables.documents(spark, sf)
      .where(col("source") === src)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .where(col("f") === 1L).count()
    assert(rows.head.getAs[Long]("hapax") === direct)
  }
}
