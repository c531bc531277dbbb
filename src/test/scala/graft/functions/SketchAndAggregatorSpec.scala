package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketches and typed aggregation over testdata:
  *  - approx_count_distinct (HLL++) within tolerance of exact;
  *  - hll_sketch_agg per group merged with hll_union_agg equals the
  *    global sketch estimate — the mergeability that makes sketches the
  *    scale path for distinct-counting 100 TB;
  *  - the typed WeightedMean Aggregator matches the SQL formula through
  *    partial aggregation and shuffle.
  */
class SketchAndAggregatorSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct is within 5% of exact on lineitem part keys") {
    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("per-group HLL sketches union to the global estimate") {
    val li = graft.queries.Tables.lineitem(spark, sfDir)
    val perGroup = li.groupBy(col("l_returnflag"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
    val merged = perGroup.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getLong(0)
    val global = li.agg(
      hll_sketch_estimate(hll_sketch_agg(col("l_partkey"))).as("est"))
      .collect()(0).getLong(0)
    val exact = li.agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    // union-of-sketches and single-pass sketch may differ in sparse/
    // dense representation, but both must estimate the same population
    for (est <- Seq(merged, global))
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"estimate $est vs exact $exact")
  }

  test("typed WeightedMean Aggregator matches the SQL formula") {
    val li = graft.queries.Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("double").as("x"),
              col("l_extendedprice").cast("double").as("w"),
              col("l_returnflag"))
    val wm = udaf(WeightedMean)
    val got = li.groupBy("l_returnflag")
      .agg(wm(col("x"), col("w")).as("wmean"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = li.groupBy("l_returnflag")
      .agg((sum(col("x") * col("w")) / sum(col("w"))).as("wmean"))
      .orderBy("l_returnflag").collect().map(r => (r.getString(0), r.getDouble(1)))
    got.zip(want).foreach { case ((ka, va), (kb, vb)) =>
      assert(ka === kb)
      assert(math.abs(va - vb) < 1e-9, s"$ka: $va vs $vb")
    }
  }
}
