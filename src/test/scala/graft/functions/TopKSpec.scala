package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("aggregator equals the window top-n on seeded skewed data") {
    import spark.implicits._
    val df = spark.range(5000).select(
      (col("id") % 7).as("key"),
      // xxhash-derived scores with deliberate ties across rows
      (xxhash64(col("id")) % 100).as("score"),
      col("id"))
    val topk = udaf(new TopK(4))
    val got = df.groupBy("key").agg(topk(col("score"), col("id")).as("t"))
      .select(col("key"), posexplode(col("t")))
      .select(col("key"), col("pos"), col("col._1").as("score"),
              col("col._2").as("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 4)
      .select(col("key"), (col("rn") - 1).as("pos"), col("score"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq === want.toSeq)
  }

  test("buffer is bounded and merge is symmetric") {
    val agg = new TopK(3)
    val xs = Seq((5L, 1L), (5L, 0L), (9L, 7L), (1L, 2L), (9L, 9L), (3L, 3L))
    val b = xs.foldLeft(agg.zero)(agg.reduce)
    assert(b.length === 3)
    assert(b === Seq((9L, 7L), (9L, 9L), (5L, 0L))) // score desc, id asc
    val (l, r) = xs.splitAt(3)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bl, br) === agg.merge(br, bl))
    assert(agg.merge(bl, br) === b)
  }

  test("q41 plans a partial+final object hash aggregate (map-side cap)") {
    val df = graft.queries.RelationalQueries.q41TopkAgg(
      spark, "/root/testdata/sf0.001")
    val aggs = df.queryExecution.sparkPlan.collect {
      case p if p.nodeName.contains("ObjectHashAggregate") => p
    }
    assert(aggs.size >= 2,
      s"expected partial+final aggregate pair, got ${aggs.size}")
  }
}
