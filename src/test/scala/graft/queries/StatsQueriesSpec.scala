package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the statistics/behavioral family at
  * sf0.001 (the cross-engine value check is the DuckDB gate at
  * sf0.01; these pin the properties a refactor could silently break).
  */
class StatsQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("moments: corr in [-1,1] micros, built-in gate true, n matches") {
    val rows = StatsQueries.statsMoments(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total === Tables.lineitem(spark, sfDir).count())
    rows.foreach { r =>
      val c = r.getAs[Long]("corr_micros")
      assert(c >= -1000000L && c <= 1000000L, s"corr_micros out of range: $c")
      assert(r.getAs[Boolean]("builtin_stats_ok"),
        s"built-in corr/stddev diverged from exact moments for ${r.get(0)}")
    }
  }

  test("histogram: buckets within [0,24], counts sum to row count, " +
       "bucket bands nest") {
    val rows = StatsQueries.histEquiWidth(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum ===
      Tables.orders(spark, sfDir).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 24)
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
      // interior buckets must respect their band edges
      if (b > 0) assert(r.getAs[Long]("min_cents") >= 100000L + b * 1996000L)
      if (b < 24) assert(r.getAs[Long]("max_cents") < 100000L + (b + 1) * 1996000L)
    }
  }

  test("funnel stages shrink monotonically and are user-level counts") {
    val r = StatsQueries.funnel(spark, sfDir).collect().head
    val (v, vc, vcp) = (r.getAs[Long]("n_view"),
      r.getAs[Long]("n_view_click"), r.getAs[Long]("n_view_click_purchase"))
    assert(v >= vc && vc >= vcp, s"funnel not monotone: $v $vc $vcp")
    assert(v > 0)
    val distinctViewers = Tables.events(spark, sfDir)
      .where(col("event_type") === "view").select("user_id").distinct().count()
    assert(v === distinctViewers)
  }

  test("retention: offset 0 counts every user; offsets bounded by it") {
    val rows = StatsQueries.retention(spark, sfDir).collect()
    val byOffset = rows.map(r =>
      r.getAs[Long]("day_offset") -> r.getAs[Long]("n_users")).toMap
    val allUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    assert(byOffset(0L) === allUsers,
      "every user is active on their own first day")
    byOffset.foreach { case (off, n) =>
      assert(n <= allUsers, s"offset $off counts $n > $allUsers users")
    }
  }

  test("scd2: versions are dense per user, intervals chain exactly") {
    val rows = StatsQueries.scd2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq ===
        (1 to rs.length).toSeq, s"user $uid versions not dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") ===
            b.getAs[Long]("valid_from_us"),
            s"user $uid: interval chain broken at version ${a.get(2)}")
        case _ =>
      }
      assert(sorted.last.getAs[Long]("valid_to_us") === 253402300799000000L,
        s"user $uid: open tail missing sentinel")
    }
  }

  test("table checksum is invariant under input split size") {
    val a = IoQueries.tableChecksum(spark, sfDir).collect()
    // xor/count commute with partitioning: force a different file
    // split and the per-group checksums must not move
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
      val b = IoQueries.tableChecksum(spark, sfDir).collect()
      assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
    assert(a.forall(_.getAs[Long]("xor56") >= 0L), "56-bit hash stays positive")
  }

  test("stratified sample: exactly k per stratum, deterministic") {
    val rows = PipelineQueries.stratifiedSample(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    val srcSizes = Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    bySrc.foreach { case (src, rs) =>
      assert(rs.length === math.min(5L, srcSizes(src)),
        s"stratum $src sampled ${rs.length}")
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq ===
        (1L to rs.length).toSeq)
    }
    val again = PipelineQueries.stratifiedSample(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("sorted batching wastes far less padding than random batching") {
    val sorted = PipelineQueries.sortedBatches(spark, sfDir).collect()
      .map(_.getAs[Long]("padding_waste")).sum
    // same batching arithmetic over a hash-random order
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val random = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("batch", ((row_number().over(w) - 1) / 16).cast("bigint"))
      .groupBy("batch")
      .agg((max(col("n_chars")) * count(lit(1)) - sum(col("n_chars")))
        .as("waste"))
      .collect().map(_.getAs[Long]("waste")).sum
    assert(sorted * 2 < random,
      s"sorted batching should at least halve padding: $sorted vs $random")
  }

  test("anomaly counts: outliers are rare and bounded by n") {
    val rows = StatsQueries.anomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getAs[Long]("n"), r.getAs[Long]("n_outliers_3sigma"))
      assert(out >= 0 && out <= n)
      assert(out * 10 < n, s"3-sigma outliers should be rare: $out of $n")
    }
  }

  test("kmeans step: clusters partition the corpus, sums are exact") {
    val rows = SimilarityQueries.kmeansStep(spark, sfDir).collect()
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val dims = 64
    assert(rows.length <= 8 * dims)
    // every (cid, pos) group for one cid reports the same n; cluster
    // sizes across cids sum to the corpus
    val byCid = rows.groupBy(_.getAs[Long]("cid"))
    val sizes = byCid.map { case (cid, rs) =>
      val ns = rs.map(_.getAs[Long]("n")).distinct
      assert(ns.length === 1, s"cluster $cid: inconsistent n across dims")
      assert(rs.length === dims, s"cluster $cid: missing dimensions")
      ns.head
    }
    assert(sizes.sum === nVecs, "clusters must partition the corpus")
  }

  test("mann-kendall: matches a brute-force pairwise sign sum per group " +
       "and the tie-corrected variance identity") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority").as("g"), col("o_orderdate").as("d"))
      .agg(sum(floor(col("o_totalprice") * lit(100) + lit(0.5)).cast("long"))
        .as("y"))
      .select(col("g"),
        datediff(col("d"), lit("1992-01-01").cast("date")).cast("long").as("x"),
        col("y"))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("x"), r.getAs[Long]("y")))
      .groupBy(_._1)
    val got = StatsQueries.mannKendall(spark, sfDir).collect()
    assert(got.length === daily.size)
    got.foreach { r =>
      val g = r.getAs[String]("o_orderpriority")
      val ys = daily(g).sortBy(_._2).map(_._3)
      val n = ys.length.toLong
      val s = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      val tieTerm = ys.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      assert(r.getAs[Long]("n_days") === n, s"group $g n_days")
      assert(r.getAs[Long]("s_stat") === s, s"group $g s_stat")
      assert(r.getAs[Long]("var18") === n * (n - 1) * (2 * n + 5) - tieTerm,
        s"group $g var18")
      assert(math.abs(r.getAs[Long]("s_stat")) <= n * (n - 1) / 2)
      assert(r.getAs[Long]("var18") >= 0L)
    }
  }
}
