package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage queries (SURVEY.md §2.6): aggregation, joins of
  * every flavor (broadcast, semi, anti, range, as-of), windows, rollup/
  * cube, set ops, JSON — the surface the reference lacks but a complete
  * engine needs. Each has an exact DuckDB oracle in the companion SQL.
  *
  * Determinism discipline for oracle hash-parity:
  *  - money/double aggregates are computed over `decimal`-cast columns
  *    (exact, order-independent in both engines), rounded, cast back to
  *    double. Plain double sums differ between engines in the last ulps.
  *  - ratios divide exact decimal sums as doubles, then round.
  *  - no timestamp-typed output columns (epoch bigints instead).
  *  - every ORDER BY / top-k has a full deterministic tie-break.
  */
object RelationalQueries {

  private def dec(c: String): Column = col(c).cast("decimal(18,2)")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-style pricing summary: hash aggregate, multiple measures. */
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

  /** Multi-way join with a broadcast dimension: revenue per nation.
    * nation/region are tiny — broadcast() keeps them off the shuffle.
    */
  def q2RevenueByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))), 2)
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  val q2Oracle: String = """
SELECT n_name,
  round(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))), 2)::double AS revenue,
  count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

  /** Distributed top-k (TakeOrderedAndProject): top-10 BUILDING-segment
    * orders by revenue, deterministic tie-break on o_orderkey.
    */
  def q3TopOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
      .where(col("c_mktsegment") === "BUILDING")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Oracle: String = """
SELECT o_orderkey,
  round(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))), 2)::double AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""

  /** Left-semi join (EXISTS): orders having at least one returned item. */
  def q4SemiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val returned = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  val q4Oracle: String = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

  /** Left-anti join (NOT EXISTS): customers with no orders since 2000. */
  def q5AntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           round(sum(dec("c_acctbal")), 2).cast("double").as("total_acctbal"))
      .orderBy("c_mktsegment")
  }

  val q5Oracle: String = """
SELECT c_mktsegment, count(*) AS n_customers,
  round(sum(cast(c_acctbal AS decimal(18,2))), 2)::double AS total_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= timestamp '2000-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

  /** TPC-H Q6-style selective scan: filters must push to parquet. */
  def q6ForecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
             col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
             col("l_discount").between(0.02, 0.06) &&
             col("l_quantity") < 24)
      .agg(round(sum(dec("l_extendedprice") * dec("l_discount")), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))

  val q6Oracle: String = """
SELECT
  round(sum(cast(l_extendedprice AS decimal(18,2)) * cast(l_discount AS decimal(18,2))), 2)::double AS revenue,
  count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= timestamp '1996-01-01' AND l_shipdate < timestamp '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
"""

  /** Running-total window per supplier, fully tie-broken ordering. */
  def q7RunningQty(spark: SparkSession, sfDir: String): DataFrame = {
    // l_quantity closes the ordering: the synthetic lineitem carries
    // duplicate (orderkey, linenumber) pairs (~118k at sf0.1), so
    // without it two tied rows would take order-DEPENDENT running sums
    // ({a, a+b} vs {b, a+b}) and the gate's row-multiset compare
    // diverges cross-engine. With quantity as the last key, tied rows
    // have equal quantity, so both tie orders yield the same multiset.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              round(sum(dec("l_quantity")).over(w), 2).cast("double").as("running_qty"))
  }

  val q7Oracle: String = """
SELECT l_suppkey, l_orderkey, l_linenumber,
  round(sum(cast(l_quantity AS decimal(18,2))) OVER (
    PARTITION BY l_suppkey
    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)::double AS running_qty
FROM lineitem
"""

  /** Rollup: order value by region/nation with subtotal + grand-total rows. */
  def q8RollupRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val n = Tables.nation(spark, sfDir)
    val r = Tables.region(spark, sfDir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(dec("o_totalprice")), 2).cast("double").as("total_value"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val q8Oracle: String = """
SELECT r_name, n_name,
  round(sum(cast(o_totalprice AS decimal(18,2))), 2)::double AS total_value,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""

  /** Cube over lineitem status flags. */
  def q9Cube(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"),
           round(sum(dec("l_quantity")), 2).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q9Oracle: String = """
SELECT l_returnflag, l_linestatus, count(*) AS n_lines,
  round(sum(cast(l_quantity AS decimal(18,2))), 2)::double AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""

  /** Set operations: INTERSECT ∪ distinct-UNION \ EXCEPT, set semantics
    * on both sides.
    */
  def q10SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val bigSpenders = o.where(col("o_totalprice") > 100000).select(col("o_custkey").as("c_custkey"))
    val machineryNeg = c.where(col("c_mktsegment") === "MACHINERY" && col("c_acctbal") < 0)
      .select(col("c_custkey"))
    val ordered2000 = o.where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(bigSpenders)
      .union(machineryNeg).distinct()
      .except(ordered2000)
      .orderBy("c_custkey")
  }

  val q10Oracle: String = """
SELECT c_custkey FROM (
  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
   INTERSECT
   SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000)
  UNION
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY' AND c_acctbal < 0
  EXCEPT
  SELECT o_custkey AS c_custkey FROM orders WHERE o_orderdate >= timestamp '2000-01-01'
)
ORDER BY c_custkey
"""

  /** Exact distinct aggregation + HAVING-style post-filter. */
  def q11SupplierStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           count(lit(1)).as("n_lines"),
           round(sum(dec("l_quantity")), 2).cast("double").as("total_qty"))
      .where(col("n_lines") >= 10)
      .orderBy("l_suppkey")

  val q11Oracle: String = """
SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts, count(*) AS n_lines,
  round(sum(cast(l_quantity AS decimal(18,2))), 2)::double AS total_qty
FROM lineitem
GROUP BY l_suppkey
HAVING count(*) >= 10
ORDER BY l_suppkey
"""

  /** Range self-join: event pairs of the same user within 60 seconds
    * (strictly ordered by (ts, event_id) to avoid double counting).
    *
    * Joined on (user_id, 60-second time bucket), not user_id alone: the
    * probe side explodes into its own bucket and the next one (any
    * partner ≤60s ahead lives in exactly one of the two), the range
    * predicate stays as the post-filter. A hot user then costs
    * O(events-per-minute²) per bucket instead of O(total-events²) —
    * the difference between a skewed key and a quadratic blowup at
    * 100 TB. Each qualifying pair matches exactly one probe bucket, so
    * no dedup pass is needed.
    */
  def q12EventBursts(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
      .withColumn("bkt", expr("unix_micros(ts) div 60000000"))
    val a = e.withColumn("probe_bkt",
      explode(array(col("bkt"), col("bkt") + 1))).as("a")
    val b = e.as("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
        col("b.bkt") === col("a.probe_bkt") &&
        col("b.ts") <= col("a.ts") + expr("INTERVAL 60 SECONDS") &&
        (col("b.ts") > col("a.ts") ||
         (col("b.ts") === col("a.ts") && col("b.event_id") > col("a.event_id"))))
      .groupBy(col("a.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  val q12Oracle: String = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts <= a.ts + INTERVAL 60 SECOND
 AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
GROUP BY a.user_id
ORDER BY a.user_id
"""

  /** As-of join: for each click, the same user's most recent error
    * strictly before it. Implemented the scalable way — one union +
    * one window pass (no per-row subquery): errors sort before clicks
    * only when strictly earlier, then last_value(ignoreNulls) carries
    * the latest error id forward.
    */
  def q13AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("is_click"),
              lit(null).cast("bigint").as("err_id"))
    val errors = e.where(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("is_click"),
              col("event_id").as("err_id"))
    // at equal ts a click sorts BEFORE the error (is_click desc? no:
    // strictly-before semantics => click first), so the error is not
    // visible to it; among equal-ts errors the larger event_id wins.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(errors)
      .withColumn("last_err", last(col("err_id"), ignoreNulls = true).over(w))
      .where(col("is_click") === 1)
      .select(col("event_id").as("click_event_id"),
              col("last_err").as("error_event_id"))
      .orderBy("click_event_id")
  }

  val q13Oracle: String = """
SELECT c.event_id AS click_event_id,
  (SELECT e.event_id FROM events e
   WHERE e.user_id = c.user_id AND e.event_type = 'error' AND e.ts < c.ts
   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS error_event_id
FROM events c
WHERE c.event_type = 'click'
ORDER BY c.event_id
"""

  /** Conditional aggregation + exact-decimal ratio: promo revenue share. */
  def q14PromoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val p = Tables.part(spark, sfDir)
    val disc = dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount"))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO", disc).otherwise(lit(0).cast("decimal(18,2)"))), 2)
          .cast("double").as("promo_revenue"),
        round(sum(disc), 2).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
              round(col("promo_revenue") / col("total_revenue"), 6).as("promo_share"))
  }

  val q14Oracle: String = """
WITH t AS (
  SELECT
    round(sum(CASE WHEN p_type = 'PROMO'
      THEN cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))
      ELSE cast(0 AS decimal(18,2)) END), 2)::double AS promo_revenue,
    round(sum(cast(l_extendedprice AS decimal(18,2)) * (cast(1 AS decimal(18,2)) - cast(l_discount AS decimal(18,2)))), 2)::double AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT promo_revenue, total_revenue,
       round(promo_revenue / total_revenue, 6) AS promo_share
FROM t
"""

  /** JSON extraction: parse events.props and aggregate the "k" field. */
  def q15Json(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           countDistinct(col("k")).as("n_distinct_k"))
      .orderBy("event_type")

  val q15Oracle: String = """
SELECT event_type, count(*) AS n,
  cast(sum(cast(json_extract_string(props, '$.k') AS bigint)) AS bigint) AS sum_k,
  count(DISTINCT cast(json_extract_string(props, '$.k') AS bigint)) AS n_distinct_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

  /** Correlated scalar subquery (decorrelated by Catalyst into a join):
    * customers whose balance beats their market segment's average.
    */
  def q16AboveSegmentAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val segAvg = c.groupBy(col("c_mktsegment").as("seg"))
      .agg((sum(dec("c_acctbal")) / count(lit(1))).as("avg_bal"))
    c.join(broadcast(segAvg), col("c_mktsegment") === col("seg"))
      .where(dec("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above"),
           round(max(dec("c_acctbal")), 2).cast("double").as("top_bal"))
      .orderBy("c_mktsegment")
  }

  val q16Oracle: String = """
SELECT c_mktsegment, count(*) AS n_above,
  round(max(cast(c_acctbal AS decimal(18,2))), 2)::double AS top_bal
FROM customer c
WHERE cast(c_acctbal AS decimal(18,2)) >
  (SELECT sum(cast(c_acctbal AS decimal(18,2))) / count(*)
   FROM customer i WHERE i.c_mktsegment = c.c_mktsegment)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

  /** Pivot (event counts per user bucket × event type), fixed columns. */
  def q17Pivot(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      // % not pmod: must agree with the oracle's `user_id % 10` for
      // negative ids too (Spark % and DuckDB % share sign semantics)
      .select((col("user_id") % 10).as("user_bucket"), col("event_type"))
      .groupBy("user_bucket")
      .pivot("event_type", Seq("click", "view", "purchase", "error"))
      .count()
      .na.fill(0L)
      .orderBy("user_bucket")

  val q17Oracle: String = """
SELECT (user_id % 10) AS user_bucket,
  count(*) FILTER (WHERE event_type = 'click') AS click,
  count(*) FILTER (WHERE event_type = 'view') AS view,
  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  count(*) FILTER (WHERE event_type = 'error') AS error
FROM events
GROUP BY 1 ORDER BY user_bucket
"""

  /** Exact percentiles (continuous interpolation) of order value per
    * priority; both engines interpolate linearly, outputs rounded.
    */
  def q18Percentiles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 2).as("p99"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val q18Oracle: String = """
SELECT o_orderpriority,
  round(quantile_cont(o_totalprice, 0.5), 2) AS p50,
  round(quantile_cont(o_totalprice, 0.9), 2) AS p90,
  round(quantile_cont(o_totalprice, 0.99), 2) AS p99,
  count(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

  /** Date/time arithmetic: order volume by year × quarter with
    * month-boundary bucketing (epoch-day outputs, no timestamp cols).
    */
  def q19DateBuckets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("y"),
              quarter(col("o_orderdate")).as("q"),
              datediff(col("o_orderdate"),
                       trunc(col("o_orderdate"), "year")).as("doy0"),
              dec("o_totalprice").as("v"))
      .groupBy("y", "q")
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("v")), 2).cast("double").as("total_value"),
           max(col("doy0")).as("max_day_of_year0"))
      .orderBy("y", "q")

  val q19Oracle: String = """
SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
  count(*) AS n_orders,
  round(sum(cast(o_totalprice AS decimal(18,2))), 2)::double AS total_value,
  max(datediff('day', date_trunc('year', o_orderdate), o_orderdate)) AS max_day_of_year0
FROM orders GROUP BY 1, 2 ORDER BY y, q
"""

  /** String function battery: case/substring/regexp/edit distance —
    * all integer/string outputs, bit-exact across engines.
    */
  def q20StringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        length(regexp_replace(col("p_name"), "[aeiou]", "")).as("n_consonants"),
        levenshtein(col("p_name"), col("p_type")).as("name_type_dist"))
      .orderBy("p_partkey")

  val q20Oracle: String = """
SELECT p_partkey,
  upper(p_name) AS uname,
  substr(p_name, 1, 5) AS prefix5,
  length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS n_consonants,
  levenshtein(p_name, p_type) AS name_type_dist
FROM part ORDER BY p_partkey
"""

  /** Multiset set operations (EXCEPT ALL / INTERSECT ALL): nation keys
    * of BUILDING customers minus MACHINERY ones, multiplicity-aware.
    */
  def q21MultisetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val building = c.where(col("c_mktsegment") === "BUILDING").select(col("c_nationkey"))
    val machinery = c.where(col("c_mktsegment") === "MACHINERY").select(col("c_nationkey"))
    building.exceptAll(machinery)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("surplus"))
      .orderBy("c_nationkey")
  }

  val q21Oracle: String = """
SELECT c_nationkey, count(*) AS surplus FROM (
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT ALL
  SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
GROUP BY c_nationkey ORDER BY c_nationkey
"""

  /** Interval RANGE window frame: per customer, rolling 30-day order
    * value ending at each order (peer-inclusive — deterministic under
    * equal order dates by construction).
    */
  def q22RangeFrame(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
              dec("o_totalprice").as("v"))
      .withColumn("rolling_30d",
        expr("""round(sum(v) OVER (
                  PARTITION BY o_custkey ORDER BY o_orderdate
                  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW), 2)""")
          .cast("double"))
      .select(col("o_orderkey"), col("rolling_30d"))
      .orderBy("o_orderkey")

  val q22Oracle: String = """
SELECT o_orderkey,
  round(sum(cast(o_totalprice AS decimal(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate
    RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 2)::double AS rolling_30d
FROM orders ORDER BY o_orderkey
"""

  /** Map construction + lookup: per-user event-type counts as a map,
    * read back by key (order-independent, so collect_list ordering
    * cannot leak into the output).
    */
  def q23MapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
             .as("m"))
      .select(col("user_id"),
              coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
              coalesce(element_at(col("m"), "error"), lit(0L)).as("errors"),
              size(col("m")).cast("bigint").as("n_types"))
      .orderBy("user_id")

  val q23Oracle: String = """
SELECT user_id,
  count(*) FILTER (WHERE event_type = 'click') AS clicks,
  count(*) FILTER (WHERE event_type = 'error') AS errors,
  count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id ORDER BY user_id
"""

  /** Extended analytic-window suite: ntile, percent_rank, cume_dist,
    * lead/lag with defaults, and first_value over one window spec.
    * The ORDER BY is total (orderkey+linenumber tie-breaks), so every
    * rank/bucket/offset value is deterministic. The two rational ranks
    * are emitted as `floor(x * 10⁶)` micros, NOT `round(x, 6)`: both
    * engines compute the same IEEE double k/n, but round()'s half-way
    * handling is library-dependent (Spark HALF_UP vs DuckDB) and
    * k/n·10⁶ can land exactly on .5 (seen at sf0.001: 41/640 →
    * 64062.5), whereas floor of a shared double is bit-deterministic.
    */
  def q24WindowSuite(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, sfDir)
      .where(col("l_suppkey") <= 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        ntile(4).over(w).as("quartile"),
        floor(percent_rank().over(w) * lit(1000000.0)).as("pct_rank_micros"),
        lead(col("l_quantity"), 1, -1).over(w).as("next_qty"),
        lag(col("l_quantity"), 1, -1).over(w).as("prev_qty"),
        first(col("l_quantity")).over(w).as("min_qty"),
        floor(cume_dist().over(w) * lit(1000000.0)).as("cume_micros"))
      .orderBy("l_suppkey", "l_quantity", "l_orderkey", "l_linenumber")
  }

  val q24Oracle: String = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
  ntile(4) OVER w AS quartile,
  cast(floor(percent_rank() OVER w * 1000000.0) AS bigint) AS pct_rank_micros,
  lead(l_quantity, 1, -1) OVER w AS next_qty,
  lag(l_quantity, 1, -1) OVER w AS prev_qty,
  first_value(l_quantity) OVER w AS min_qty,
  cast(floor(cume_dist() OVER w * 1000000.0) AS bigint) AS cume_micros
FROM lineitem
WHERE l_suppkey <= 20
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_quantity, l_orderkey, l_linenumber)
ORDER BY l_suppkey, l_quantity, l_orderkey, l_linenumber
"""

  /** The q12 range-join shape written NAIVELY — `user_id` equality plus
    * a raw 60-second band, no hand-rolled bucketing — and fixed by the
    * engine instead: [[graft.plans.RangeBucketJoin]] (registered here
    * via `spark.experimental.extraOptimizations`, idempotently) rewrites
    * the band into a bucketed equi-join at optimization time. Semantics:
    * ordered event pairs of the same user 0–60s apart (self excluded).
    *
    * q12 keeps the manual rewrite as the query-idiom variant; this one
    * grades the optimizer rule doing the same job — result equality is
    * the oracle's job, plan shape is RangeBucketJoinSpec's.
    */
  def q25RangeJoinRule(spark: SparkSession, sfDir: String): DataFrame = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RangeBucketJoin))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RangeBucketJoin
    val e = Tables.events(spark, sfDir).select("event_id", "user_id", "ts")
    val a = e.as("a")
    val b = e.as("b")
    a.join(b,
        col("a.user_id") === col("b.user_id") &&
        col("b.ts") >= col("a.ts") &&
        col("b.ts") <= col("a.ts") + expr("INTERVAL 60 SECONDS") &&
        col("b.event_id") =!= col("a.event_id"))
      .groupBy(col("a.user_id").as("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  val q25Oracle: String = """
SELECT a.user_id, count(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 60 SECOND
 AND b.event_id <> a.event_id
GROUP BY a.user_id
ORDER BY a.user_id
"""

  /** Calendar densification (gap-fill): one row per day of 1994-Q1,
    * including days with NO orders (zero-filled), plus a running
    * cumulative count. The day spine comes from `sequence()` exploded —
    * generated, not scanned — and the fact side left-joins onto it;
    * the spine is one literal-range expression per partition, so at
    * scale the fill costs one broadcast-sized dimension, never a scan
    * of the fact table's date domain. The time-series shape every
    * metrics warehouse needs (dashboards can't tolerate missing days).
    */
  def q26GapFill(spark: SparkSession, sfDir: String): DataFrame = {
    val spine = spark.range(1)
      .select(explode(expr(
        "sequence(DATE '1996-01-01', DATE '1996-03-31', INTERVAL 1 DAY)"))
        .as("day"))
    val daily = Tables.orders(spark, sfDir)
      .where(col("o_orderdate").between("1996-01-01", "1996-03-31"))
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("day"), "left")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
      .withColumn("cum_orders",
        sum(col("n_orders")).over(org.apache.spark.sql.expressions.Window
          .orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("day")
  }

  // day emitted as 'yyyy-MM-dd' strings on both sides: parquet DATE
  // (Spark) and DuckDB DATE reach pandas as different dtypes
  // (object-date vs datetime64) and fail the driver's exact compare.
  val q26Oracle: String = """
WITH spine AS (
  SELECT unnest(generate_series(DATE '1996-01-01', DATE '1996-03-31',
                                INTERVAL 1 DAY))::date AS day),
daily AS (
  SELECT o_orderdate::date AS day, count(*) AS n
  FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1996-03-31 00:00:00'
  GROUP BY 1)
SELECT strftime(s.day, '%Y-%m-%d') AS day, coalesce(d.n, 0) AS n_orders,
       cast(sum(coalesce(d.n, 0)) OVER (ORDER BY s.day
         ROWS UNBOUNDED PRECEDING) AS bigint) AS cum_orders
FROM spine s LEFT JOIN daily d ON d.day = s.day
ORDER BY s.day
"""

  /** Full outer join of two aggregates keyed by nation: customer counts
    * vs supplier counts, either side possibly absent (exercises the
    * one outer-join flavor the suite lacked; null-extension semantics
    * are the graded behavior, coalesced into sentinel -1 counts).
    */
  def q27FullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .where(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val s = Tables.supplier(spark, sfDir)
      .where(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(s, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
        coalesce(col("n_cust"), lit(-1L)).as("n_cust"),
        coalesce(col("n_supp"), lit(-1L)).as("n_supp"))
      .orderBy("nationkey")
  }

  val q27Oracle: String = """
WITH c AS (
  SELECT c_nationkey AS nationkey, count(*) AS n_cust
  FROM customer WHERE c_acctbal > 9000 GROUP BY 1),
s AS (
  SELECT s_nationkey AS nationkey, count(*) AS n_supp
  FROM supplier WHERE s_acctbal > 9000 GROUP BY 1)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(c.n_cust, -1) AS n_cust,
       coalesce(s.n_supp, -1) AS n_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
"""

  /** The explicit-salting skew join (graft.operators.SkewJoin) as a
    * graded query: lineitem (big, skewed side) joined to part (small
    * side, replicated across 8 salts) on partkey, revenue rolled up by
    * part type. The salted join is exactly the plain equi-join —
    * that's the oracle — while pre-spreading every hot key across 8
    * reducer sub-keys BEFORE the shuffle, the manual fallback for
    * skew AQE can't fix (e.g. a shuffled-hash build side). Cost
    * visible in the plan: the small side shuffles 8×.
    */
  def q28SaltedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val big = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("partkey"),
              dec("l_extendedprice").as("price"))
    val small = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("partkey"), col("p_type"))
    graft.operators.SkewJoin.saltedEquiJoin(big, small, "partkey", 8)
      .groupBy("p_type")
      .agg(round(sum(col("price")), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("p_type")
  }

  val q28Oracle: String = """
SELECT p_type,
       round(sum(cast(l_extendedprice AS decimal(18,2))), 2)::double
         AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
GROUP BY p_type ORDER BY p_type
"""

  /** Explicit GROUPING SETS — the general form rollup/cube (q8/q9) are
    * sugar for: an arbitrary, non-hierarchical set of grouping
    * combinations in ONE pass over the fact table (Spark plans one
    * Expand + one aggregate — versus three scans + union by hand).
    * `grouping()` flags per dimension disambiguate "NULL because
    * aggregated" from a genuinely null key, which is what makes the
    * result joinable downstream.
    */
  def q34GroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("bigint").as("g_rf"),
           grouping(col("l_linestatus")).cast("bigint").as("g_ls"),
           count(lit(1)).as("n_lines"),
           round(sum(dec("l_extendedprice")), 2).cast("double").as("revenue"))
      .orderBy(col("g_rf"), col("g_ls"),
               col("l_returnflag").asc_nulls_first,
               col("l_linestatus").asc_nulls_first)

  val q34Oracle: String = """
SELECT l_returnflag, l_linestatus,
       cast(grouping(l_returnflag) AS bigint) AS g_rf,
       cast(grouping(l_linestatus) AS bigint) AS g_ls,
       count(*) AS n_lines,
       round(sum(cast(l_extendedprice AS decimal(18,2))), 2)::double
         AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
         l_linestatus ASC NULLS FIRST
"""

  /** Correlated LATERAL subquery with ORDER BY … LIMIT — "top-2 orders
    * per customer" in its most natural SQL spelling. The point is the
    * OPTIMIZER surface: Spark's DecorrelateInnerQuery rewrites the
    * per-row subquery into a window (rank ≤ 2) over ONE broadcast hash
    * join — verified no nested-loop in the plan (PlanShapeSpec) — so
    * the lateral form costs the same as the hand-written window
    * top-n. Price exposed in integer cents (deterministic both
    * engines); customers sampled %10 to bound graded output.
    */
  /** Temp-view names are suffixed with the sanitized sfDir (the
    * bucketedJoin table-name discipline): fixed names on a shared
    * session would let interleaved runs at different scales silently
    * read each other's data.
    */
  private def viewSuffix(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_")

  def q35LateralTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = viewSuffix(sfDir)
    Tables.orders(spark, sfDir).createOrReplaceTempView(s"graft_lat_orders_$sfx")
    Tables.customer(spark, sfDir).createOrReplaceTempView(s"graft_lat_customer_$sfx")
    spark.sql(s"""
      SELECT c.c_custkey, t.o_orderkey, t.pc
      FROM graft_lat_customer_$sfx c,
      LATERAL (
        SELECT o_orderkey,
               cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS pc
        FROM graft_lat_orders_$sfx o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
      ) t
      WHERE c.c_custkey % 10 = 0
      ORDER BY c_custkey, pc DESC, o_orderkey
    """)
  }

  val q35Oracle: String = """
SELECT c.c_custkey, t.o_orderkey, t.pc
FROM customer c,
LATERAL (
  SELECT o_orderkey,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS pc
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
WHERE c.c_custkey % 10 = 0
ORDER BY c_custkey, pc DESC, o_orderkey
"""

  /** Recursive CTE (Spark 4's UnionLoop operator) — declarative
    * multi-source bounded BFS: per-node 3-hop reach counts on the
    * sparse (quantity ≥ 45) co-purchase graph, as a histogram. The
    * SAME SQL text runs on DuckDB — the portability argument for
    * recursion as syntax rather than a driver loop. UNION ALL + depth
    * guard (not UNION) because recursive dedup across iterations isn't
    * portable; the `count(DISTINCT node)` collapse absorbs the
    * duplicate walks. The iterative twin (driver loop + localCheckpoint,
    * `GraphQueries.khopHist`) is what a 100 TB run uses — per-round
    * plan truncation and an explicit frontier; the recursive form is
    * the right tool when depth is small and the engine owns the loop.
    */
  def q36Reach3(spark: SparkSession, sfDir: String): DataFrame = {
    val view = s"graft_rec_lineitem_${viewSuffix(sfDir)}"
    Tables.lineitem(spark, sfDir).createOrReplaceTempView(view)
    spark.sql(q36Sql(view))
  }

  private def q36Sql(tbl: String): String = s"""
WITH RECURSIVE li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM $tbl WHERE l_quantity >= 45
),
e AS (
  SELECT a.l_partkey AS src, b.l_partkey AS dst
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey <> b.l_partkey
),
walk(seed, node, d) AS (
  SELECT l_partkey, l_partkey, 0 FROM (SELECT DISTINCT l_partkey FROM li)
  UNION ALL
  SELECT w.seed, e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < 3
),
reach AS (
  SELECT seed, count(DISTINCT node) - 1 AS n_reach FROM walk GROUP BY seed
)
SELECT n_reach, count(*) AS n_nodes FROM reach GROUP BY n_reach ORDER BY n_reach
"""

  val q36Oracle: String = q36Sql("lineitem")

  /** Runtime bloom-filter join: the big side's scan is pre-filtered by
    * a bloom filter BUILT AT RUNTIME from the selective small side —
    * Spark's InjectRuntimeFilter, the shuffle-join analogue of
    * broadcast pruning (at 100 TB: the urgent-orders filter is 20% of
    * orders, and lineitem rows that would fail the join never leave
    * the scan stage). Run on a cloned session with the app-side size
    * threshold dropped so the rewrite fires at test scale (production
    * leaves the 10 GB default); broadcast disabled so the bloom path,
    * not BHJ pruning, is what's exercised. Semantics are exactly the
    * plain join — that's the oracle — while BloomJoinSpec pins the
    * bloom_filter expression in the plan.
    */
  def q37BloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sub = spark.newSession()
    sub.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    sub.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables.lineitem(sub, sfDir)
      .select(col("l_orderkey"), dec("l_extendedprice").as("price"))
    val o = Tables.orders(sub, sfDir)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(sum(col("price")), 2).cast("double").as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  val q37Oracle: String = """
SELECT cast(year(o_orderdate) AS bigint) AS o_year,
       round(sum(cast(l_extendedprice AS decimal(18,2))), 2)::double
         AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY 1 ORDER BY o_year
"""

  /** VARIANT (Spark 4's open semi-structured type): `parse_json` once
    * into a binary-encoded variant, then typed `variant_get` path
    * extraction — the schema-on-read path for ingesting JSON event
    * payloads WITHOUT a fixed struct schema (q15 covers the
    * schema'd `from_json` path; this is its schemaless complement,
    * and at 100 TB the variant encoding is columnar-shreddable where
    * repeated string JSON is not). Aggregates over the extracted
    * field are exact integers.
    */
  def q38Variant(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q38Oracle: String = """
WITH x AS (
  SELECT event_type,
         cast(json_extract_string(props, '$.k') AS bigint) AS k
  FROM events
)
SELECT event_type, count(*) AS n, cast(sum(k) AS bigint) AS sum_k,
       min(k) AS min_k, max(k) AS max_k
FROM x GROUP BY event_type ORDER BY event_type
"""

  /** Array higher-order-function family over per-order quantity
    * arrays: collect → sort_array → slice / aggregate-fold / filter /
    * exists, emitted as scalars (strings/ints — arrays stay OUT of the
    * gate output; the driver's row-sorter can't hash ndarray cells).
    * Every HOF here is codegen'd by Catalyst — the reason the engine's
    * per-group logic (CC star ops, quality rules) is written with
    * these rather than UDFs. Quantities are integer-valued doubles;
    * cast through bigint for cross-engine exactness.
    */
  def q39ArrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") % 97 === 0)
      .select(col("l_orderkey"), col("l_quantity").cast("bigint").as("q"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("q"))).as("qs"))
      .select(col("l_orderkey"),
        size(col("qs")).cast("bigint").as("n_items"),
        concat_ws(",", slice(col("qs"), 1, 3)).as("low3"),
        aggregate(col("qs"), lit(0L),
          (acc: Column, x: Column) => acc + x).as("sum_q"),
        size(filter(col("qs"), (x: Column) => x > 25)).cast("bigint")
          .as("n_big"),
        exists(col("qs"), (x: Column) => x === 1).as("has_one"),
        element_at(col("qs"), -1).as("max_q"))
      .orderBy("l_orderkey")

  val q39Oracle: String = """
WITH g AS (
  SELECT l_orderkey, list_sort(list(cast(l_quantity AS bigint))) AS qs
  FROM lineitem WHERE l_orderkey % 97 = 0
  GROUP BY l_orderkey
)
SELECT l_orderkey,
       cast(len(qs) AS bigint) AS n_items,
       array_to_string(qs[1:3], ',') AS low3,
       cast(list_sum(qs) AS bigint) AS sum_q,
       cast(len(list_filter(qs, x -> x > 25)) AS bigint) AS n_big,
       len(list_filter(qs, x -> x = 1)) > 0 AS has_one,
       qs[-1] AS max_q
FROM g ORDER BY l_orderkey
"""

  /** The correlated-subquery SYNTAX family — EXISTS, NOT IN, and a
    * scalar subquery in one WHERE clause. q4/q5 grade the explicit
    * semi/anti JOIN form; this grades Spark's RewritePredicateSubquery
    * + scalar-subquery planning of the same semantics as a user would
    * write them. The above-average comparison is cross-multiplied into
    * integer cents (value·n > Σcents) so the scalar subquery carries
    * no float boundary.
    */
  def q40SubqueryFamily(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = viewSuffix(sfDir)
    Tables.orders(spark, sfDir).createOrReplaceTempView(s"graft_sq_orders_$sfx")
    Tables.customer(spark, sfDir).createOrReplaceTempView(s"graft_sq_customer_$sfx")
    spark.sql(s"""
      SELECT c.c_mktsegment, count(*) AS n_custs
      FROM graft_sq_customer_$sfx c
      WHERE EXISTS (SELECT 1 FROM graft_sq_orders_$sfx o
                    WHERE o.o_custkey = c.c_custkey)
        AND c.c_custkey NOT IN (SELECT o_custkey FROM graft_sq_orders_$sfx
                                WHERE o_orderpriority = '5-LOW')
        AND cast(floor(c.c_acctbal * 100 + 0.5) AS bigint) *
              (SELECT count(*) FROM graft_sq_customer_$sfx) >
            (SELECT sum(cast(floor(c_acctbal * 100 + 0.5) AS bigint))
             FROM graft_sq_customer_$sfx)
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """)
  }

  val q40Oracle: String = """
SELECT c.c_mktsegment, count(*) AS n_custs
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
                          WHERE o_orderpriority = '5-LOW')
  AND cast(floor(c.c_acctbal * 100 + 0.5) AS bigint) *
        (SELECT count(*) FROM customer) >
      (SELECT cast(sum(cast(floor(c_acctbal * 100 + 0.5) AS bigint)) AS bigint)
       FROM customer)
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""

  /** Grouped top-k via the bounded-buffer [[graft.functions.TopK]]
    * typed Aggregator — the third spelling of top-n-per-key in the
    * suite, and the only one that scales: q3 is global top-k
    * (TakeOrderedAndProject), q35 is the lateral/window form (full
    * shuffle of every row), this one partial-aggregates ≤ k pairs per
    * group map-side so the shuffle carries kilobytes at any input
    * size. Same (score desc, id asc) determinism contract as the
    * window form — the oracle IS the window form.
    */
  def q41TopkAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK(3))
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
              floor(col("o_totalprice") * 100 + 0.5).cast("bigint").as("pc"),
              col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(topk(col("pc"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("bigint").as("rank"),
              col("col._1").as("pc"), col("col._2").as("o_orderkey"))
      .orderBy("o_orderpriority", "rank")
  }

  val q41Oracle: String = """
WITH ranked AS (
  SELECT o_orderpriority,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS pc,
         o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
                                     o_orderkey) AS rank
  FROM orders)
SELECT o_orderpriority, cast(rank AS bigint) AS rank, pc, o_orderkey
FROM ranked WHERE rank <= 3
ORDER BY o_orderpriority, rank
"""

  /** Unpivot (melt) — q17's inverse: a wide per-month matrix of order
    * counts by priority (built with the same pivot machinery) melted
    * back to long form. Wide→long is the normalization step feeding
    * chart/ML consumers from report-shaped tables; Spark's `unpivot`
    * plans as a single Expand (no join, no shuffle beyond the source
    * agg). Null cells (month × priority never seen) are dropped by
    * unpivot's default — mirrored in the oracle by just grouping the
    * long form.
    */
  def q42Unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val wide = Tables.orders(spark, sfDir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
    wide.unpivot(Array(col("month")),
        prios.map(p => col(s"`$p`")).toArray, "o_orderpriority", "n")
      .where(col("n").isNotNull)
      .select(col("month"), col("o_orderpriority"), col("n"))
      .orderBy("month", "o_orderpriority")
  }

  val q42Oracle: String = """
SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
       count(*) AS n
FROM orders
GROUP BY 1, 2 ORDER BY month, o_orderpriority
"""

  /** `session_window` in BATCH group-by — the same native session
    * operator stream_sessions runs with streaming state, here planned
    * as an ordinary aggregation (sort within user, merge adjacent
    * windows). Output is the session-length histogram: events per
    * session vs how many sessions — the engagement distribution a
    * product team actually reads. One shuffle on user_id.
    */
  def q43SessionBatch(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events").as("session_len"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("session_len")

  val q43Oracle: String = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
),
lens AS (
  SELECT user_id, sid, count(*) AS session_len FROM sess GROUP BY 1, 2
)
SELECT session_len, count(*) AS n_sessions
FROM lens GROUP BY session_len ORDER BY session_len
"""

  /** Bitmap-exact distinct count (Spark's bitmap_* aggregate family):
    * user ids bucketed into 32k-bit bitmaps, OR-merged per group, bits
    * summed — EXACT distinct with mergeable O(|id-range|/8)-byte
    * state. The third point on the distinct-count spectrum the suite
    * grades: exact-but-shuffles-everything (countDistinct), tiny-but-
    * approximate (HLL/KMV), and this — exact AND re-aggregatable,
    * the right choice when the id space is dense (user ids are).
    * Oracle is plain count(DISTINCT): the bitmap path must agree
    * exactly.
    */
  def q46BitmapDistinct(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bucket"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
        .as("bm"))
      .groupBy("event_type")
      .agg(sum(expr("bitmap_count(bm)")).as("n_distinct_users"))
      .orderBy("event_type")

  val q46Oracle: String = """
SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type ORDER BY event_type
"""

  /** Ordered string aggregation (`listagg` — SQL:2016, new in Spark
    * 4): the top-3 spenders' names per market segment concatenated in
    * rank order — report-shaped output where the ORDER inside the
    * aggregate is part of the semantics (unordered listagg is
    * nondeterministic under parallelism and could never pass this
    * gate).
    */
  def q47Listagg(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, sfDir)
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .groupBy("c_mktsegment")
      .agg(expr("listagg(c_name, ',') WITHIN GROUP (ORDER BY rn)")
        .as("top3_names"))
      .orderBy("c_mktsegment")
  }

  val q47Oracle: String = """
WITH ranked AS (
  SELECT c_mktsegment, c_name,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY rn) AS top3_names
FROM ranked WHERE rn <= 3
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""

  /** Map higher-order functions — q23 builds maps; this TRANSFORMS
    * them: `transform_values`, `map_filter`, `map_keys` over the
    * per-user event-type count map, emitted as scalars (map column
    * ordering is engine-internal, so maps never leave the query).
    */
  def q48MapHofs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("event_type"), col("n"))))
        .as("m"))
      .select(col("user_id"),
        expr("aggregate(map_values(transform_values(m, (k, v) -> v * 2)), " +
          "cast(0 as bigint), (a, x) -> a + x)").as("total_doubled"),
        expr("size(map_filter(m, (k, v) -> v >= 3))").cast("bigint")
          .as("n_frequent"),
        expr("array_join(array_sort(map_keys(m)), ',')").as("types_sorted"))
      .orderBy("user_id")

  val q48Oracle: String = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id,
       cast(2 * sum(n) AS bigint) AS total_doubled,
       cast(count(CASE WHEN n >= 3 THEN 1 END) AS bigint) AS n_frequent,
       string_agg(event_type, ',' ORDER BY event_type) AS types_sorted
FROM c GROUP BY user_id ORDER BY user_id
"""

  /** LOCF forward-fill (`last_value ... IGNORE NULLS` over a running
    * frame) — the time-series gap-repair idiom: error events carry no
    * reading (NULL), each takes the user's last observed value.
    * IGNORE NULLS is the whole point — the plain window form would
    * need a nested max-over-struct trick. Values in deterministic
    * micros; leading nulls surface as −1 sentinels (gate-friendly).
    * Sampled to user_id % 97 = 0, same as q33_scd2.
    */
  def q49Locf(spark: SparkSession, sfDir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(spark, sfDir)
      .where(col("user_id") % 97 === 0)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") =!= "error",
          floor(col("value") * lit(1000000.0) + lit(0.5)).cast("bigint"))
          .as("v_micros"))
      .withColumn("locf_micros",
        coalesce(last(col("v_micros"), ignoreNulls = true).over(w), lit(-1L)))
      .withColumn("v_micros", coalesce(col("v_micros"), lit(-1L)))
      .orderBy("user_id", "ts_us", "event_id")
  }

  val q49Oracle: String = """
WITH s AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type <> 'error'
              THEN cast(floor(value * 1000000.0 + 0.5) AS bigint) END
           AS v
  FROM events WHERE user_id % 97 = 0
)
SELECT user_id, event_id, ts_us,
       coalesce(v, -1) AS v_micros,
       coalesce(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS UNBOUNDED PRECEDING), -1) AS locf_micros
FROM s ORDER BY user_id, ts_us, event_id
"""

  /** q53_rolling_slope: 7-observation rolling OLS trend of daily order
    * revenue — the "is this series rising and how fast" detector a
    * volume monitor runs, as a pure window computation. With the
    * regressor fixed to in-window position i = 0..6, the slope
    * denominator is the constant 7·Σi² − (Σi)² = 196 and the numerator
    * needs only two windowed sums: `A = Σ y` and `B = Σ r·y` (r the
    * global row number), because Σ i·y = B − (r−6)·A. So
    * `slope = (7·(B − (r−6)·A) − 21·A) / 196` — integer cents
    * end-to-end, emitted as `num div 196` (truncation toward zero,
    * which Spark's `div` and DuckDB's `//` share even for negative
    * slopes). Only full windows emit. Headroom:
    * B ≤ n_days²·max_daily_cents ≈ 10¹⁶ at sf1.
    *
    * Scale: the daily series is one map-side-combinable aggregation;
    * the window runs over that tiny series. The single-partition
    * window is fine BECAUSE the series is bounded by the calendar —
    * a per-entity variant would partition by the entity key.
    */
  def q53RollingSlope(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint"))
        .as("y"))
    val ord = Window.orderBy("d")
    val w7 = ord.rowsBetween(-6, 0)
    daily
      .select(col("d"), col("y"), row_number().over(ord).cast("long").as("r"))
      .select(col("d"), col("y"), col("r"),
        count(lit(1)).over(w7).as("cnt"),
        sum(col("y")).over(w7).as("a"),
        sum(col("y") * col("r")).over(w7).as("b"))
      .where(col("cnt") === 7)
      .select(col("d"), col("y"),
        // `div` truncates toward zero — and so does DuckDB's `//`
        // (verified: -7 // 2 = -3), so negative slopes floor alike.
        expr("(7 * (b - (r - 6) * a) - 21 * a) div 196")
          .as("slope_cents_per_day"))
      .orderBy("d")
  }

  val q53Oracle: String = """
WITH daily AS (
  SELECT o_orderdate AS d,
         sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS y
  FROM orders GROUP BY 1
),
rn AS (
  SELECT d, y, row_number() OVER (ORDER BY d) AS r FROM daily
),
win AS (
  SELECT d, y, r,
         count(*) OVER w7 AS cnt,
         sum(y) OVER w7 AS a,
         sum(y * r) OVER w7 AS b
  FROM rn
  WINDOW w7 AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT d, CAST(y AS BIGINT) AS y,
       cast((7 * (b - (r - 6) * a) - 21 * a) // 196 AS bigint)
         AS slope_cents_per_day
FROM win WHERE cnt = 7 ORDER BY d
"""

  /** q54_window_distinct: per-event DISTINCT-count over a trailing
    * 1-hour RANGE frame — "how many distinct event types did this user
    * produce in the last hour, as of each event" (the behavioral-breadth
    * signal a fraud screen computes; a burst of many TYPES is a
    * different animal from a burst of many events, which q12 already
    * covers). Spark has no `count(DISTINCT …) OVER`, so the engine
    * expresses it as `size(collect_set(…))` over the frame — the
    * canonical rewrite — while the DuckDB oracle uses its native
    * windowed DISTINCT aggregate: two different engine mechanisms, one
    * graded answer. The frame bound rides `unix_micros(ts)` with a
    * −3,600,000,000 lower bound on BOTH sides (integer microseconds, so
    * frame membership is exact — casting to whole seconds would shift
    * boundary events between engines).
    *
    * Scale: the window partitions by user_id — per-user frames, no
    * global sort — and the graded output is the per-user reduction
    * (max / sum of the per-event counts), one further map-side-
    * combinable aggregation. collect_set's in-frame state is bounded by
    * the type alphabet (5 here), not the event volume.
    */
  def q54WindowDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"))
      .select(col("user_id"),
        size(collect_set(col("event_type")).over(w)).cast("long")
          .as("types_1h"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
           max(col("types_1h")).as("max_types_1h"),
           sum(col("types_1h")).as("sum_types_1h"))
      .orderBy("user_id")
  }

  val q54Oracle: String = """
WITH t AS (
  SELECT user_id,
         cast(count(DISTINCT event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
         ) AS bigint) AS types_1h
  FROM events
)
SELECT user_id, count(*) AS n_events,
       max(types_1h) AS max_types_1h,
       CAST(sum(types_1h) AS BIGINT) AS sum_types_1h
FROM t GROUP BY user_id ORDER BY user_id
"""

  /** q60_sql_udf: the SQL-defined scalar function surface (Spark 4 SQL
    * UDFs, SPARK-44747) — business logic shipped as `CREATE FUNCTION`
    * text instead of engine code, the portability layer warehouses use
    * for shared metric definitions. The body is INLINED into the plan
    * at resolution (it is an expression template, not a called
    * function), so it whole-stage-codegens exactly like writing the
    * expression at the call site — the zero-cost counterpart of a JVM
    * UDF, and why this beats `udf(...)` for anything expressible in
    * SQL. The oracle replays the body textually, which is precisely
    * the portability claim.
    *
    * Scale: one map-side-combinable aggregate over lineitem; the UDF
    * adds no execution machinery at all (verified: the optimized plan
    * is identical to the inlined expression's).
    */
  def q60SqlUdf(spark: SparkSession, sfDir: String): DataFrame = {
    val sfx = viewSuffix(sfDir)
    Tables.lineitem(spark, sfDir)
      .createOrReplaceTempView(s"graft_udf_lineitem_$sfx")
    // OR REPLACE: Verify/Bench reuse one session across invocations.
    spark.sql("""
      CREATE OR REPLACE TEMPORARY FUNCTION graft_net_cents(
        price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS BIGINT
      RETURN cast(floor(price * (1.0 - disc) * (1.0 + tax) * 100 + 0.5)
                  AS bigint)
    """)
    spark.sql(s"""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n,
             sum(graft_net_cents(l_extendedprice, l_discount, l_tax))
               AS net_cents
      FROM graft_udf_lineitem_$sfx
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  }

  /** The UDF body inlined — the textual-portability contract. */
  val q60Oracle: String = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(cast(floor(l_extendedprice * (1.0 - l_discount)
                           * (1.0 + l_tax) * 100 + 0.5) AS bigint))
            AS BIGINT) AS net_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

  /** q61_null_safe_join: the null-safe equality join (`<=>` /
    * IS NOT DISTINCT FROM) — the operator that lets NULL keys MATCH
    * EACH OTHER, which plain `=` silently drops (the classic
    * missing-rows bug when a dimension key is nullable). Keys are
    * derived nullable buckets (`nullif(key % 100, 7)` on both sides),
    * pre-aggregated per side so the join is 101×101 keys, then joined
    * with `<=>`: the gate proves the NULL bucket's row survives with
    * both sides' counts — an inner `=` join would lose it.
    *
    * Scale: both inputs collapse to ≤ 101 rows before the join —
    * aggregate-then-join, the standard shape when join keys are
    * low-cardinality; `<=>` plans as a hash join exactly like `=`
    * (null-safe equality is hashable — no fallback to NLJ).
    */
  def q61NullSafeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .groupBy(expr("nullif(c_custkey % 100, 7)").as("k"))
      .agg(count(lit(1)).as("n_cust"))
    val o = Tables.orders(spark, sfDir)
      .groupBy(expr("nullif(o_custkey % 100, 7)").as("ko"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("k") <=> col("ko"))
      .select(col("k"), col("n_cust"), col("n_orders"))
      .orderBy(col("k").asc_nulls_first)
  }

  val q61Oracle: String = """
WITH c AS (
  SELECT nullif(c_custkey % 100, 7) AS k, count(*) AS n_cust
  FROM customer GROUP BY 1
),
o AS (
  SELECT nullif(o_custkey % 100, 7) AS ko, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT k, n_cust, n_orders
FROM c JOIN o ON k IS NOT DISTINCT FROM ko
ORDER BY k NULLS FIRST
"""

  /** q62_try_arithmetic: the error-safe arithmetic family (`try_divide`
    * / `try_mod` / `try_multiply`) under ANSI mode — fault-tolerant
    * totality as a VALUE contract: where strict ANSI arithmetic would
    * kill the job (divide-by-zero, int64 overflow), the try_ forms
    * yield NULL and the pipeline keeps moving — the right default for
    * curation over dirty data, where one poison row must not abort a
    * 100 TB pass. Graded as per-flag null-counts with the failure rows
    * identified exactly (quantity = 25 ⇒ zero denominator; orderkey ≥ 2
    * ⇒ `orderkey · int64max` overflows), which the oracle replays with
    * CASE arithmetic.
    *
    * Scale: one map-side-combinable aggregate; try_ forms codegen like
    * their strict twins plus a branch.
    */
  def q62TryArithmetic(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(expr("try_divide(1, l_quantity - 25)").isNull, 1L)
          .otherwise(0L)).as("div_nulls"),
        sum(when(expr("try_mod(l_linenumber, cast(l_quantity as int) - 25)")
          .isNull, 1L).otherwise(0L)).as("mod_nulls"),
        sum(when(expr("try_multiply(l_orderkey, 9223372036854775807L)")
          .isNull, 1L).otherwise(0L)).as("overflow_nulls"))
      .orderBy("l_returnflag")
  }

  val q62Oracle: String = """
SELECT l_returnflag, count(*) AS n,
       CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS div_nulls,
       CAST(sum(CASE WHEN l_quantity = 25 THEN 1 ELSE 0 END) AS BIGINT)
         AS mod_nulls,
       CAST(sum(CASE WHEN l_orderkey >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS overflow_nulls
FROM lineitem GROUP BY 1 ORDER BY l_returnflag
"""

  /** q63_rfm: RFM customer segmentation — the marketing-warehouse
    * staple. Per customer: Recency (last order day), Frequency (order
    * count), Monetary (lifetime cents); each scored into quintiles via
    * `ntile(5)` with a full (metric, custkey) deterministic tie-break,
    * then graded as the (r, f, m) segment grid (≤ 125 rows) with
    * segment population and revenue. Exercises ntile — the one ranking
    * window function no other graded query carries.
    *
    * Scale: the per-customer rollup is map-side combinable and keyed
    * on o_custkey; the ntile windows then run over the CUSTOMER
    * DIMENSION (orders of magnitude under the fact table — the global
    * sort is |customers|·3, not |orders|). At true 100 TB dimension
    * scale the quintile boundaries would come from one exact
    * percentile pass instead of a global window; the segment semantics
    * graded here are identical.
    */
  def q63Rfm(spark: SparkSession, sfDir: String): DataFrame = {
    val money = floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("bigint")
    val per = Tables.orders(spark, sfDir)
      .groupBy("o_custkey")
      .agg(max(datediff(col("o_orderdate"), lit("1992-01-01").cast("date"))
             .cast("long")).as("last_day"),
           count(lit(1)).as("freq"),
           sum(money).as("money"))
    per
      .withColumn("r_score",
        ntile(5).over(Window.orderBy(col("last_day"), col("o_custkey"))))
      .withColumn("f_score",
        ntile(5).over(Window.orderBy(col("freq"), col("o_custkey"))))
      .withColumn("m_score",
        ntile(5).over(Window.orderBy(col("money"), col("o_custkey"))))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"), sum(col("money")).as("money_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }

  val q63Oracle: String = """
WITH per AS (
  SELECT o_custkey,
         max(date_diff('day', DATE '1992-01-01', o_orderdate)) AS last_day,
         count(*) AS freq,
         sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS money
  FROM orders GROUP BY 1
),
scored AS (
  SELECT money,
         ntile(5) OVER (ORDER BY last_day, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY freq, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY money, o_custkey) AS m_score
  FROM per
)
SELECT r_score, f_score, m_score, count(*) AS n_customers,
       CAST(sum(money) AS BIGINT) AS money_cents
FROM scored GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score
"""

  /** q64_collation: the Spark 4 COLLATION surface — case-insensitive
    * equality inside DISTINCT aggregation via
    * `collate(x, 'UTF8_LCASE')`, graded against the binary-collation
    * count of the same column. The input deliberately mixes case (even
    * part keys lowercase their type), so per brand the binary distinct
    * sees ~2× the case-insensitive distinct — the gap IS the feature
    * under test, and the oracle reproduces the collated count with
    * `lower()` (UTF8_LCASE ≡ lowercase-fold on this ASCII data; full
    * ICU collations have no cross-engine mirror, which is why the
    * graded one is LCASE).
    *
    * Scale: one narrow projection + one map-side-combinable grouped
    * distinct per collation — collation changes the comparator, not
    * the plan shape.
    */
  def q64Collation(spark: SparkSession, sfDir: String): DataFrame = {
    val mixed = when(col("p_partkey") % 2 === 0, lower(col("p_type")))
      .otherwise(col("p_type"))
    Tables.part(spark, sfDir)
      .select(col("p_brand"), mixed.as("mixed"))
      .groupBy("p_brand")
      .agg(countDistinct(col("mixed")).as("n_binary"),
           countDistinct(expr("collate(mixed, 'UTF8_LCASE')")).as("n_lcase"),
           count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }

  val q64Oracle: String = """
WITH m AS (
  SELECT p_brand,
         CASE WHEN p_partkey % 2 = 0 THEN lower(p_type) ELSE p_type END
           AS mixed
  FROM part
)
SELECT p_brand, count(DISTINCT mixed) AS n_binary,
       count(DISTINCT lower(mixed)) AS n_lcase,
       count(*) AS n_parts
FROM m GROUP BY 1 ORDER BY p_brand
"""

  /** q65_pipe_syntax: the Spark 4 SQL PIPE syntax (`|>`) plus named
    * PARAMETERIZED SQL in one graded query — the two SQL-surface
    * features an analyst migrating from a notebook engine asks about
    * first. The pipeline (scan |> filter |> aggregate |> filter |>
    * sort) is the linear form of a classic priority rollup; the status
    * filter and the having floor arrive as NAMED PARAMETERS through
    * `spark.sql(query, args)` — never string-interpolated. The oracle
    * is the same query in ANSI form, so the gate proves pipe
    * resolution changes syntax only, not semantics.
    *
    * Scale: identical plan to the ANSI form — one map-side-combinable
    * aggregate over a pushed-down filter; syntax sugar costs nothing.
    */
  def q65PipeSyntax(spark: SparkSession, sfDir: String): DataFrame = {
    val view = s"orders_pipe_${viewSuffix(sfDir)}"
    Tables.orders(spark, sfDir).createOrReplaceTempView(view)
    spark.sql(
      s"""FROM $view
         ||> WHERE o_orderstatus = :status
         ||> AGGREGATE count(*) AS n_orders,
         |     sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS cents
         |     GROUP BY o_orderpriority
         ||> WHERE n_orders >= :floor
         ||> ORDER BY o_orderpriority""".stripMargin,
      Map("status" -> "F", "floor" -> 10))
  }

  val q65Oracle: String = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(cast(floor(o_totalprice * 100 + 0.5) AS bigint)) AS BIGINT)
         AS cents
FROM orders WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority HAVING count(*) >= 10
ORDER BY o_orderpriority
"""

  /** q66_pit_join: POINT-IN-TIME join against a versioned (SCD2)
    * dimension — the lakehouse consumption pattern for q33_scd2's
    * build side. Profile-changing events (signup/error) become
    * validity-interval versions per user; each purchase fact then
    * joins THE version valid at its timestamp
    * (`valid_from ≤ t < valid_to` — exactly one match by interval
    * construction, `'none'` for purchases before any version), graded
    * as purchases and value attributed per profile state. This is the
    * "what did the customer look like WHEN they bought" join that
    * naive latest-version joins silently get wrong.
    *
    * Scale: the join carries the user_id EQUI key — Catalyst plans a
    * hash/sort-merge join with the interval bounds as residual
    * conditions, never a nested loop; per-user version chains are
    * bounded by that user's own profile-change count.
    */
  def q66PitJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id") % 97 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value") * 100 + lit(0.5)).cast("bigint").as("cents"))
      .localCheckpoint() // dim and fact sides share the scan
    val wd = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val dim = ev.where(col("event_type").isin("signup", "error"))
      .select(col("user_id").as("d_user"), col("event_type").as("state"),
        col("ts_us").as("valid_from_us"),
        coalesce(lead(col("ts_us"), 1).over(wd),
          lit(253402300799000000L)).as("valid_to_us"))
    ev.where(col("event_type") === "purchase")
      .join(dim,
        col("user_id") === col("d_user") &&
        col("ts_us") >= col("valid_from_us") &&
        col("ts_us") < col("valid_to_us"),
        "left")
      .groupBy(coalesce(col("state"), lit("none")).as("state"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("value_cents"))
      .orderBy("state")
  }

  val q66Oracle: String = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         cast(floor(value * 100 + 0.5) AS bigint) AS cents
  FROM events WHERE user_id % 97 = 0
),
dim AS (
  SELECT user_id, event_type AS state, ts_us AS valid_from_us,
         coalesce(lead(ts_us, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts_us, event_id),
                  253402300799000000) AS valid_to_us
  FROM ev WHERE event_type IN ('signup', 'error')
),
f AS (SELECT * FROM ev WHERE event_type = 'purchase')
SELECT coalesce(d.state, 'none') AS state,
       count(*) AS n_purchases,
       CAST(sum(f.cents) AS BIGINT) AS value_cents
FROM f LEFT JOIN dim d
  ON d.user_id = f.user_id
 AND f.ts_us >= d.valid_from_us AND f.ts_us < d.valid_to_us
GROUP BY 1 ORDER BY state
"""

  /** q67_generators: the table-GENERATOR builtin family in one query —
    * `inline` (array<struct> → columns), `posexplode_outer` (empty
    * arrays still emit a null row — the outer-generator contract that
    * keeps parent rows alive), and `stack` (the literal-row unpivot).
    * Each form's output is reduced to long-form (metric, value) rows
    * whose arithmetic the oracle reproduces relationally, so the gate
    * pins the generator SEMANTICS (row multiplicities, null-row
    * emission) rather than any opaque shape. The custom-Generator
    * complement is [[graft.functions.CliquePairs]]; these are the
    * built-in ones a SQL user reaches for first.
    *
    * Scale: the per-order collect is keyed and bounded by order size;
    * every downstream aggregate is map-side combinable over a
    * checkpointed ≤|orders|/100 base.
    */
  def q67Generators(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_orderkey") % 100 === 0)
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(struct(col("l_linenumber"),
        floor(col("l_quantity")).cast("bigint").as("qty")))).as("lines"))
      .localCheckpoint()
    val inlined = li.selectExpr("l_orderkey", "inline(lines)")
    val outer = li
      .select(col("l_orderkey"),
        expr("filter(lines, x -> x.qty >= 46)").as("big"))
      .selectExpr("l_orderkey", "posexplode_outer(big) AS (pos, line)")
    val st = inlined.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum(col("qty")).as("sum_qty"))
      .selectExpr("l_orderkey",
        "stack(2, 'n_lines', n_lines, 'sum_qty', sum_qty) AS (metric, value)")
    def row(metric: String, df: DataFrame): DataFrame =
      df.select(lit(metric).as("metric"), col("value").cast("long").as("value"))
    row("inline_rows", inlined.agg(count(lit(1)).as("value")))
      .unionAll(row("inline_qty_total", inlined.agg(sum(col("qty")).as("value"))))
      .unionAll(row("outer_rows", outer.agg(count(lit(1)).as("value"))))
      .unionAll(row("outer_big_lines", outer.agg(count(col("pos")).as("value"))))
      .unionAll(row("outer_empty_orders",
        outer.where(col("pos").isNull).agg(count(lit(1)).as("value"))))
      .unionAll(row("stack_rows", st.agg(count(lit(1)).as("value"))))
      .unionAll(row("stack_qty_total",
        st.where(col("metric") === "sum_qty").agg(sum(col("value")).as("value"))))
      .orderBy("metric")
  }

  val q67Oracle: String = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, cast(floor(l_quantity) AS bigint) AS qty
  FROM lineitem WHERE l_orderkey % 100 = 0
),
per AS (
  SELECT l_orderkey, count(*) AS n_lines, sum(qty) AS sum_qty
  FROM li GROUP BY 1
),
big AS (
  SELECT l_orderkey, count(*) AS n_big FROM li WHERE qty >= 46 GROUP BY 1
)
SELECT * FROM (
  SELECT 'inline_qty_total' AS metric, CAST(sum(qty) AS BIGINT) AS value
  FROM li
  UNION ALL SELECT 'inline_rows', count(*) FROM li
  UNION ALL SELECT 'outer_big_lines',
    CAST((SELECT coalesce(sum(n_big), 0) FROM big) AS BIGINT)
  UNION ALL SELECT 'outer_empty_orders',
    CAST((SELECT count(*) FROM per) - (SELECT count(*) FROM big) AS BIGINT)
  UNION ALL SELECT 'outer_rows',
    CAST((SELECT coalesce(sum(n_big), 0) FROM big)
         + (SELECT count(*) FROM per) - (SELECT count(*) FROM big) AS BIGINT)
  UNION ALL SELECT 'stack_qty_total', CAST(sum(sum_qty) AS BIGINT) FROM per
  UNION ALL SELECT 'stack_rows', 2 * count(*) FROM per
)
ORDER BY metric
"""

  /** q68_timezone: named-zone conversion pinned against pure offset
    * arithmetic — `from_utc_timestamp(ts, 'America/New_York')` graded
    * as the (utc_hour, ny_hour) joint distribution. The events span
    * January 2024 only, so the zone sits at EST (UTC−5) for every row
    * and the oracle can state the conversion as `(h − 5) mod 24`
    * without an engine timezone database in the loop (DuckDB's ICU
    * rules need not match Java's); the gate still proves Spark
    * resolved the NAMED zone to the right offset for these instants.
    * A regenerated data vintage crossing the 2024-03-10 DST
    * transition would silently turn the oracle's fixed −5 wrong, so
    * the query REQUIRES the standard-time window up front — a
    * regeneration fails loudly at the source instead of reading as a
    * Spark timezone bug (ADVICE r5).
    *
    * Scale: a narrow projection + a ≤24²-row aggregate (the vintage
    * guard is one combinable max over the same narrow column).
    */
  def q68Timezone(spark: SparkSession, sfDir: String): DataFrame = {
    val maxRow = Tables.events(spark, sfDir)
      .agg(max(to_date(col("ts"))).cast("string")).head
    require(!maxRow.isNullAt(0),
      "q68: events table is empty — the DST vintage guard has nothing to " +
        "validate; point sfDir at a populated vintage")
    val maxDay = maxRow.getString(0)
    require(maxDay < "2024-03-10",
      s"events vintage reaches $maxDay >= 2024-03-10 (US DST transition): " +
        "q68's fixed EST(-5) oracle is only valid in the standard-time " +
        "window — regenerate the oracle arithmetic, don't trust this gate")
    Tables.events(spark, sfDir)
      .select(hour(col("ts")).as("utc_hour"),
        hour(from_utc_timestamp(col("ts"), "America/New_York")).as("ny_hour"))
      .groupBy("utc_hour", "ny_hour").agg(count(lit(1)).as("n"))
      .orderBy("utc_hour")
  }

  val q68Oracle: String = """
SELECT CAST((epoch_us(ts) // 3600000000) % 24 AS INT) AS utc_hour,
       CAST(((epoch_us(ts) // 3600000000) - 5) % 24 AS INT) AS ny_hour,
       count(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY utc_hour
"""

  /** q70_weighted_median: revenue-WEIGHTED median of order quantity per
    * return flag — "the quantity at which half the money sits", which
    * an unweighted median (q18) misstates whenever big-ticket lines
    * cluster at particular sizes. Exact integer definition: the
    * smallest quantity whose running weight doubles past the total
    * (`2·cumw ≥ totw`), so no interpolation and no floats; weights are
    * exact cents.
    *
    * Scale: one window keyed by the group (running weight in quantity
    * order) + one combinable total per group — the standard two-pass
    * weighted-quantile shape; nothing global.
    */
  def q70WeightedMedian(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("bigint").as("qty"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("bigint")
          .as("w"))
      .groupBy("l_returnflag", "qty").agg(sum(col("w")).as("w"))
    val win = Window.partitionBy("l_returnflag").orderBy("qty")
    base
      .withColumn("cumw", sum(col("w")).over(win))
      .withColumn("totw", sum(col("w")).over(
        Window.partitionBy("l_returnflag")))
      .where(col("cumw") * 2 >= col("totw"))
      .groupBy("l_returnflag")
      .agg(min(col("qty")).as("weighted_median_qty"),
           max(col("totw")).as("total_weight_cents"))
      .orderBy("l_returnflag")
  }

  val q70Oracle: String = """
WITH base AS (
  SELECT l_returnflag, cast(floor(l_quantity) AS bigint) AS qty,
         sum(cast(floor(l_extendedprice * 100 + 0.5) AS bigint)) AS w
  FROM lineitem GROUP BY 1, 2
),
c AS (
  SELECT l_returnflag, qty, w,
         sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         sum(w) OVER (PARTITION BY l_returnflag) AS totw
  FROM base
)
SELECT l_returnflag,
       CAST(min(qty) AS BIGINT) AS weighted_median_qty,
       CAST(max(totw) AS BIGINT) AS total_weight_cents
FROM c WHERE cumw * 2 >= totw
GROUP BY 1 ORDER BY l_returnflag
"""

  /** q71_log_histogram: power-of-two (log₂-spaced) histogram of order
    * value — the latency/size-histogram shape every observability
    * stack uses, where linear bins (q30) drown the tail. The bin index
    * is `bit_length(cents)` — an exact integer log₂, no floats, no
    * log() — and each bin row carries its [2^(k-1), 2^k) bounds so the
    * result is self-describing.
    *
    * Scale: a narrow projection + a ≤64-row combinable rollup.
    */
  def q71LogHistogram(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("bigint")
        .as("cents"))
      // bin = bit width of the value = exact floor(log2)+1, computed as
      // the length of the binary string — no floats anywhere.
      .withColumn("bin", length(expr("bin(cents)")))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_orders"), min(col("cents")).as("min_cents"),
           max(col("cents")).as("max_cents"))
      .select(col("bin"),
        expr("shiftleft(1L, bin - 1)").as("bin_lo"),
        expr("shiftleft(1L, bin) - 1").as("bin_hi"),
        col("n_orders"), col("min_cents"), col("max_cents"))
      .orderBy("bin")

  val q71Oracle: String = """
WITH c AS (
  SELECT cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS cents
  FROM orders
),
b AS (SELECT cents, length(printf('%b', cents)) AS bin FROM c)
SELECT CAST(bin AS INT) AS bin,
       CAST(1::BIGINT << (bin - 1) AS BIGINT) AS bin_lo,
       CAST((1::BIGINT << bin) - 1 AS BIGINT) AS bin_hi,
       count(*) AS n_orders,
       CAST(min(cents) AS BIGINT) AS min_cents,
       CAST(max(cents) AS BIGINT) AS max_cents
FROM b GROUP BY bin ORDER BY bin
"""

  /** q73_bitwise_agg: the bitwise/boolean aggregate surface —
    * `bit_and`/`bit_or`/`bit_xor` over a key column and
    * `bool_and`/`bool_or` over predicates, per order priority. These
    * five are the aggregates this suite hadn't pinned (q46's bitmap
    * distinct uses SCALAR shifts; io_checksum uses bit_xor only as a
    * content hash), and they're exactly the shape cross-engine bugs
    * hide in: engines agree on sum() long before they agree on what
    * bit_and of an empty-ish group or a NULL-laden predicate returns.
    * Also closes the q73 numbering gap flagged in the r5 verdict.
    *
    * Scale: map-side combinable by construction (all five are
    * commutative semigroup folds), 5-group output.
    */
  def q73BitwiseAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("bit_and(o_custkey)").as("and_cust"),
        expr("bit_or(o_custkey)").as("or_cust"),
        expr("bit_xor(o_custkey)").as("xor_cust"),
        expr("bool_and(o_totalprice > 1000)").as("all_over_1k"),
        expr("bool_or(o_orderstatus = 'F')").as("any_finished"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  val q73Oracle: String = """
SELECT o_orderpriority,
       CAST(bit_and(o_custkey) AS BIGINT) AS and_cust,
       CAST(bit_or(o_custkey) AS BIGINT) AS or_cust,
       CAST(bit_xor(o_custkey) AS BIGINT) AS xor_cust,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       count(*) AS n
FROM orders GROUP BY 1 ORDER BY o_orderpriority
"""

  /** q74_range_tvf: the table-valued-function surface — `range()` in a
    * SQL FROM clause generating the calendar spine, anti-checked
    * against the observed order days: "which days have NO orders".
    * q26_gapfill builds its spine with `sequence()`+explode (the
    * expression route); this is the TVF route a SQL user writes, and
    * the graded missing-day count proves the generated spine is exact.
    *
    * Scale: the spine is calendar-bounded; the observed-day distinct
    * is one combinable pass.
    */
  def q74RangeTvf(spark: SparkSession, sfDir: String): DataFrame = {
    val view = s"orders_tvf_${viewSuffix(sfDir)}"
    Tables.orders(spark, sfDir).createOrReplaceTempView(view)
    // Spine bounds as driver scalars inlined into the TVF arguments
    // (the bm25 driver-scalar pattern): range() takes literal args.
    val b = spark.sql("SELECT min(datediff(o_orderdate, DATE '1992-01-01'))," +
      s" max(datediff(o_orderdate, DATE '1992-01-01')) FROM $view").head()
    val (lo, hi) = (b.getInt(0), b.getInt(1))
    spark.sql(
      s"""WITH cal AS (SELECT id AS day FROM range($lo, ${hi + 1})),
         |obs AS (
         |  SELECT DISTINCT datediff(o_orderdate, DATE '1992-01-01') AS day
         |  FROM $view
         |)
         |SELECT count(*) AS n_calendar,
         |       (SELECT count(*) FROM obs) AS n_observed,
         |       cast(count(*) - (SELECT count(*) FROM obs) AS bigint)
         |         AS n_missing
         |FROM cal""".stripMargin)
  }

  val q74Oracle: String = """
WITH b AS (
  SELECT min(date_diff('day', DATE '1992-01-01', o_orderdate)) AS lo,
         max(date_diff('day', DATE '1992-01-01', o_orderdate)) AS hi
  FROM orders
),
cal AS (
  -- spine sized by the data (ADVICE r5: the old hardcoded range(0,
  -- 5000) would silently truncate if the order-date span ever grew);
  -- the range TVF itself rejects subquery args, but unnest(range(...))
  -- as a list expression accepts them.
  SELECT unnest(range((SELECT lo FROM b), (SELECT hi FROM b) + 1)) AS day
),
obs AS (
  SELECT DISTINCT date_diff('day', DATE '1992-01-01', o_orderdate) AS day
  FROM orders
)
SELECT count(*) AS n_calendar,
       (SELECT count(*) FROM obs) AS n_observed,
       CAST(count(*) - (SELECT count(*) FROM obs) AS BIGINT) AS n_missing
FROM cal
"""

  /** q75_three_valued_logic: the SQL NULL truth table, graded — every
    * (a, b) combination over {true, false, null} evaluated through
    * AND / OR / NOT / = / IS DISTINCT FROM and emitted as strings
    * ('t'/'f'/'null'). Three-valued logic is where engines quietly
    * diverge from programmer intuition (NULL AND FALSE = FALSE but
    * NULL OR FALSE = NULL; NULL = NULL is NULL while IS DISTINCT FROM
    * says FALSE); pinning the full table cross-engine certifies the
    * foundation every filter in this suite stands on. The 9 input rows
    * come from the range TVF with nullif-derived booleans — no table
    * data needed, no data ever shaped like this naturally.
    *
    * Scale: nine rows; the value is semantic, not computational.
    */
  /** q77_topk_per_key: the custom whole-operator plan
    * ([[graft.plans.TopKPerKeyPlan]] → strategy →
    * [[graft.plans.TopKPerKeyExec]]) graded end-to-end — each
    * customer's top-3 orders by price (exact cents; ties broken by
    * orderkey, a total order, so the answer is deterministic and the
    * oracle's `row_number()` filter states the same set). The plan is
    * the partial/final bounded-heap pair with ONE hash shuffle of at
    * most 3 rows per customer per map task — no sort, no window;
    * `TopKPerKeySpec` pins that plan shape.
    */
  def q77TopkPerKey(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").as("price_c"))
    graft.plans.TopKPerKey.topK(base,
        Seq(col("o_custkey")),
        Seq(col("price_c").desc, col("o_orderkey").asc), 3)
      .orderBy(col("o_custkey"), col("price_c").desc, col("o_orderkey"))
  }

  val q77Oracle: String = """
SELECT o_custkey, o_orderkey, price_c
FROM (
  SELECT o_custkey, o_orderkey,
         cast(floor(o_totalprice * 100 + 0.5) AS bigint) AS price_c,
         row_number() OVER (PARTITION BY o_custkey
           ORDER BY cast(floor(o_totalprice * 100 + 0.5) AS bigint) DESC,
                    o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
ORDER BY o_custkey, price_c DESC, o_orderkey
"""

  def q75ThreeValuedLogic(spark: SparkSession, sfDir: String): DataFrame =
    spark.sql("""
      WITH v AS (
        SELECT id div 3 AS ia, id % 3 AS ib FROM range(0, 9)
      ),
      b AS (
        SELECT ia, ib,
               CASE WHEN ia = 0 THEN true WHEN ia = 1 THEN false END AS a,
               CASE WHEN ib = 0 THEN true WHEN ib = 1 THEN false END AS b
        FROM v
      ),
      e AS (
        SELECT cast(ia AS bigint) AS ia, cast(ib AS bigint) AS ib,
               a AND b AS and_r, a OR b AS or_r, NOT a AS not_a,
               a = b AS eq_r, a IS DISTINCT FROM b AS distinct_r
        FROM b
      )
      SELECT ia, ib,
             coalesce(cast(and_r AS string), 'null') AS and_r,
             coalesce(cast(or_r AS string), 'null') AS or_r,
             coalesce(cast(not_a AS string), 'null') AS not_a,
             coalesce(cast(eq_r AS string), 'null') AS eq_r,
             cast(distinct_r AS string) AS distinct_r
      FROM e ORDER BY ia, ib""")

  val q75Oracle: String = """
WITH v AS (
  SELECT r.range // 3 AS ia, r.range % 3 AS ib FROM range(0, 9) r
),
b AS (
  SELECT ia, ib,
         CASE WHEN ia = 0 THEN true WHEN ia = 1 THEN false END AS a,
         CASE WHEN ib = 0 THEN true WHEN ib = 1 THEN false END AS b
  FROM v
),
e AS (
  SELECT CAST(ia AS BIGINT) AS ia, CAST(ib AS BIGINT) AS ib,
         a AND b AS and_r, a OR b AS or_r, NOT a AS not_a,
         a = b AS eq_r, a IS DISTINCT FROM b AS distinct_r
  FROM b
)
SELECT ia, ib,
       coalesce(CAST(and_r AS varchar), 'null') AS and_r,
       coalesce(CAST(or_r AS varchar), 'null') AS or_r,
       coalesce(CAST(not_a AS varchar), 'null') AS not_a,
       coalesce(CAST(eq_r AS varchar), 'null') AS eq_r,
       CAST(distinct_r AS varchar) AS distinct_r
FROM e ORDER BY ia, ib
"""

  /** q76_interval_overlap: peak concurrency per event type — treat each
    * event as a half-open 30-minute interval [ts, ts+30m) and report the
    * maximum number simultaneously open. The classic SWEEP LINE: explode
    * each interval to a (+1 at start, −1 at end) point, order points,
    * running-sum, take the max — O(n log n) via one sort-based window
    * instead of the O(n²) self-range-join a naive "count overlapping
    * others" formulation plans. The ORDER BY is a TOTAL order
    * (t, delta, event_id — unique since an event's two points differ in
    * delta): ties between equal timestamps would otherwise make the
    * intermediate running sums order-dependent (the q7 lesson), and
    * delta-ascending puts closings before openings at the same instant,
    * so touching intervals never count as concurrent. Microsecond
    * integer arithmetic end-to-end (the watermark lesson: no
    * timestamp-vs-double drift cross-engine).
    *
    * Scale: the window partitions by event_type, so each partition sorts
    * independently — 2n points, one shuffle, no join at all. For a
    * single giant partition the standard fix is range-partitioned
    * prefix sums (two passes: per-chunk sums, then a broadcast scan of
    * chunk offsets).
    */
  def q76IntervalOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("t"), col("event_id"))
    val pts = ev.select(col("event_type"), col("t"), lit(1).as("delta"), col("event_id"))
      .unionAll(ev.select(col("event_type"),
        (col("t") + lit(1800000000L)).as("t"), lit(-1).as("delta"), col("event_id")))
    val w = Window.partitionBy("event_type")
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("conc", sum(col("delta")).over(w))
      .groupBy("event_type")
      .agg(max(col("conc")).as("max_concurrent"),
        expr("count(1) div 2").as("n_events"))
      .orderBy("event_type")
  }

  val q76Oracle: String = """
WITH pts AS (
  SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
  UNION ALL
  SELECT event_type, epoch_us(ts) + 1800000000, -1, event_id FROM events
),
run AS (
  SELECT event_type,
         sum(delta) OVER (PARTITION BY event_type
                          ORDER BY t, delta, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM pts
)
SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent,
       CAST(count(*) // 2 AS BIGINT) AS n_events
FROM run GROUP BY 1 ORDER BY 1
"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_three_valued_logic" -> (q75ThreeValuedLogic _),
    "q76_interval_overlap" -> (q76IntervalOverlap _),
    "q77_topk_per_key" -> (q77TopkPerKey _),
    "q73_bitwise_agg" -> (q73BitwiseAgg _),
    "q74_range_tvf" -> (q74RangeTvf _),
    "q71_log_histogram" -> (q71LogHistogram _),
    "q70_weighted_median" -> (q70WeightedMedian _),
    "q67_generators" -> (q67Generators _),
    "q68_timezone" -> (q68Timezone _),
    "q66_pit_join" -> (q66PitJoin _),
    "q65_pipe_syntax" -> (q65PipeSyntax _),
    "q64_collation" -> (q64Collation _),
    "q63_rfm" -> (q63Rfm _),
    "q61_null_safe_join" -> (q61NullSafeJoin _),
    "q62_try_arithmetic" -> (q62TryArithmetic _),
    "q60_sql_udf" -> (q60SqlUdf _),
    "q54_window_distinct" -> (q54WindowDistinct _),
    "q53_rolling_slope" -> (q53RollingSlope _),
    "q49_locf" -> (q49Locf _),
    "q48_map_hofs" -> (q48MapHofs _),
    "q46_bitmap_distinct" -> (q46BitmapDistinct _),
    "q47_listagg" -> (q47Listagg _),
    "q43_session_batch" -> (q43SessionBatch _),
    "q42_unpivot" -> (q42Unpivot _),
    "q41_topk_agg" -> (q41TopkAgg _),
    "q40_subquery_family" -> (q40SubqueryFamily _),
    "q39_array_funcs" -> (q39ArrayFuncs _),
    "q38_variant" -> (q38Variant _),
    "q36_recursive_reach" -> (q36Reach3 _),
    "q37_bloom_join" -> (q37BloomJoin _),
    "q35_lateral_topn" -> (q35LateralTopn _),
    "q34_grouping_sets" -> (q34GroupingSets _),
    "q28_salted_join" -> (q28SaltedJoin _),
    "q26_gapfill" -> (q26GapFill _),
    "q27_full_outer" -> (q27FullOuter _),
    "q25_range_join_rule" -> (q25RangeJoinRule _),
    "q24_window_suite" -> (q24WindowSuite _),
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q2_revenue_by_nation" -> (q2RevenueByNation _),
    "q3_top_orders" -> (q3TopOrders _),
    "q4_semi_join" -> (q4SemiJoin _),
    "q5_anti_join" -> (q5AntiJoin _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q7_running_qty" -> (q7RunningQty _),
    "q8_rollup_revenue" -> (q8RollupRevenue _),
    "q9_cube" -> (q9Cube _),
    "q10_setops" -> (q10SetOps _),
    "q11_supplier_stats" -> (q11SupplierStats _),
    "q12_event_bursts" -> (q12EventBursts _),
    "q13_asof_join" -> (q13AsofJoin _),
    "q14_promo_share" -> (q14PromoShare _),
    "q15_json" -> (q15Json _),
    "q16_above_segment_avg" -> (q16AboveSegmentAvg _),
    "q17_pivot" -> (q17Pivot _),
    "q18_percentiles" -> (q18Percentiles _),
    "q19_date_buckets" -> (q19DateBuckets _),
    "q20_string_funcs" -> (q20StringFuncs _),
    "q21_multiset_ops" -> (q21MultisetOps _),
    "q22_range_frame" -> (q22RangeFrame _),
    "q23_map_funcs" -> (q23MapFuncs _),
  )

  val oracles: Map[String, String] = Map(
    "q75_three_valued_logic" -> q75Oracle,
    "q76_interval_overlap" -> q76Oracle,
    "q77_topk_per_key" -> q77Oracle,
    "q73_bitwise_agg" -> q73Oracle,
    "q74_range_tvf" -> q74Oracle,
    "q71_log_histogram" -> q71Oracle,
    "q70_weighted_median" -> q70Oracle,
    "q67_generators" -> q67Oracle,
    "q68_timezone" -> q68Oracle,
    "q66_pit_join" -> q66Oracle,
    "q65_pipe_syntax" -> q65Oracle,
    "q64_collation" -> q64Oracle,
    "q63_rfm" -> q63Oracle,
    "q61_null_safe_join" -> q61Oracle,
    "q62_try_arithmetic" -> q62Oracle,
    "q60_sql_udf" -> q60Oracle,
    "q54_window_distinct" -> q54Oracle,
    "q28_salted_join" -> q28Oracle,
    "q34_grouping_sets" -> q34Oracle,
    "q35_lateral_topn" -> q35Oracle,
    "q36_recursive_reach" -> q36Oracle,
    "q37_bloom_join" -> q37Oracle,
    "q38_variant" -> q38Oracle,
    "q39_array_funcs" -> q39Oracle,
    "q40_subquery_family" -> q40Oracle,
    "q41_topk_agg" -> q41Oracle,
    "q42_unpivot" -> q42Oracle,
    "q43_session_batch" -> q43Oracle,
    "q46_bitmap_distinct" -> q46Oracle,
    "q47_listagg" -> q47Oracle,
    "q48_map_hofs" -> q48Oracle,
    "q53_rolling_slope" -> q53Oracle,
    "q49_locf" -> q49Oracle,
    "q26_gapfill" -> q26Oracle,
    "q27_full_outer" -> q27Oracle,
    "q25_range_join_rule" -> q25Oracle,
    "q24_window_suite" -> q24Oracle,
    "q1_pricing_summary" -> q1Oracle,
    "q2_revenue_by_nation" -> q2Oracle,
    "q3_top_orders" -> q3Oracle,
    "q4_semi_join" -> q4Oracle,
    "q5_anti_join" -> q5Oracle,
    "q6_forecast_revenue" -> q6Oracle,
    "q7_running_qty" -> q7Oracle,
    "q8_rollup_revenue" -> q8Oracle,
    "q9_cube" -> q9Oracle,
    "q10_setops" -> q10Oracle,
    "q11_supplier_stats" -> q11Oracle,
    "q12_event_bursts" -> q12Oracle,
    "q13_asof_join" -> q13Oracle,
    "q14_promo_share" -> q14Oracle,
    "q15_json" -> q15Oracle,
    "q16_above_segment_avg" -> q16Oracle,
    "q17_pivot" -> q17Oracle,
    "q18_percentiles" -> q18Oracle,
    "q19_date_buckets" -> q19Oracle,
    "q20_string_funcs" -> q20Oracle,
    "q21_multiset_ops" -> q21Oracle,
    "q22_range_frame" -> q22Oracle,
    "q23_map_funcs" -> q23Oracle,
  )
}
