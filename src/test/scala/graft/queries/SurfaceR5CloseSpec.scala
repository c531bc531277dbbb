package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the round-5 close additions that the DuckDB hash gate
  * cannot see: completeness of the spatial grid join against brute
  * force, the Matryoshka funnel's recall against the exact top-k, set
  * identities behind the theta difference estimator, and the
  * arithmetic/partition properties of the new analytics queries.
  */
class SurfaceR5CloseSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("geo_grid_join: the 3x3 cell probe is COMPLETE — shell histogram " +
       "equals the brute-force all-pairs computation") {
    val r = 5000L
    val p = GeoQueries.points(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    val brute = (for {
      (a, xa, ya) <- p; (b, xb, yb) <- p if a < b
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb) if d2 <= r * r
    } yield (d2 * 4) / (r * r)).groupBy(identity).view.mapValues(_.size).toMap
    val grid = GeoQueries.gridJoin(spark, sf).collect()
      .map(row => row.getAs[Long]("shell") -> row.getAs[Long]("n_pairs"))
      .toMap
    assert(grid.values.sum > 0, "no pairs found at all — degenerate test")
    assert(grid === brute.map { case (k, v) => (k, v.toLong) })
  }

  test("geo_knn: neighbors are the true nearest by exhaustive check " +
       "for one query point") {
    val rows = GeoQueries.knn(spark, sf).collect()
    assert(rows.nonEmpty)
    val qid = rows.head.getAs[Long]("qid")
    val p = GeoQueries.points(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getLong(2)))
    val (_, qx, qy) = p.find(_._1 == qid).get
    val expect = p.filter(_._1 != qid)
      .map { case (id, x, y) =>
        (id, (x - qx) * (x - qx) + (y - qy) * (y - qy)) }
      .sortBy { case (id, d2) => (d2, id) }.take(3).map(_._1).toSeq
    val got = rows.filter(_.getAs[Long]("qid") == qid)
      .sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("neighbor")).toSeq
    assert(got === expect)
  }

  test("sim_matryoshka: funnel recall of the exact top-5 beats the " +
       "random-candidate baseline by a wide margin") {
    val funnel = SimilarityQueries.matryoshka(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val exact = SimilarityQueries.topkBruteForce(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val n = Tables.embeddings(spark, sf).count()
    val recalls = exact.map { case (q, ex) =>
      funnel.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    val mean = recalls.sum / recalls.size
    val randomBaseline = 20.0 / n // 20 coarse candidates drawn blind
    // Uniform random embeddings are the worst case for prefix search
    // (measured mean recall: 0.46 on the sf0.01 draw, 0.14 here) — the
    // floor is "clearly better than blind candidates", not a fixed
    // recall, so a data regeneration can't flake the suite.
    assert(mean >= 0.10, s"mean recall $mean — funnel broken")
    assert(mean > 2 * randomBaseline,
      s"mean recall $mean not better than random $randomBaseline")
  }

  test("sketch_theta_anotb: |A\\B| + |A∩B| = |A| on the exact hash sets, " +
       "and the estimate is finite and non-negative") {
    val row = SketchQueries.thetaAnotB(spark, sf).head()
    val nExact = row.getAs[Long]("n_exact")
    assert(row.getAs[Long]("est_anotb") >= 0L)
    // recompute the identity directly over the shingle hash sets
    def shingles(src: String) = Tables.documents(spark, sf)
      .where(col("source") === src)
      .select(explode(expr(
        "CASE WHEN size(split(text, ' ')) < 3 THEN array() " +
        "ELSE transform(sequence(0, size(split(text, ' ')) - 3), " +
        "i -> concat_ws(' ', split(text, ' ')[i], split(text, ' ')[i+1]," +
        " split(text, ' ')[i+2])) END")).as("g"))
      .select(col("g")).distinct().collect().map(_.getString(0)).toSet
    val a = shingles("src0"); val b = shingles("src1")
    assert(nExact === (a -- b).size.toLong)
    assert((a -- b).size + (a & b).size === a.size)
  }

  test("graph_modularity: degree mass sums to 2m, within-edges sum to " +
       "<= m, and Q is inside its theoretical range") {
    val rows = GraphQueries.modularity(spark, sf).collect()
    val m = rows.head.getAs[Long]("m_edges")
    assert(rows.map(_.getAs[Long]("d_sum")).sum === 2 * m)
    assert(rows.map(_.getAs[Long]("e_within")).sum <= m)
    val qPpm = rows.map(_.getAs[Long]("q_contrib_ppm")).sum
    assert(qPpm >= -500000L && qPpm <= 1000000L,
      s"Q = ${qPpm / 1e6} outside [-0.5, 1]")
  }

  test("pipe_kfold: folds partition the corpus and the leak counts " +
       "match a direct recount") {
    val rows = PipelineQueries.kfold(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("fold")).toSeq.sorted === (0L to 4L))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    // direct recount of leaky docs: docs whose exact-dup key spans folds
    val fold = conv(substring(md5(concat(lit("kf#"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("bigint") % 5
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      fold.as("fold"),
      concat_ws(" ", sort_array(array_distinct(split(col("text"), " "))))
        .as("key"))
    val leaky = docs.groupBy("key")
      .agg(countDistinct(col("fold")).as("nf"))
      .where(col("nf") > 1)
    val directLeakyDocs = docs.join(leaky, "key").count()
    assert(rows.map(_.getAs[Long]("n_leaky_docs")).sum === directLeakyDocs)
  }

  test("q69_ohlc: bar invariants (low <= open/close <= high) and event " +
       "counts partition the table") {
    val rows = EventQueries.ohlc(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Long]("open_cents"),
        r.getAs[Long]("high_cents"), r.getAs[Long]("low_cents"),
        r.getAs[Long]("close_cents"))
      assert(l <= o && o <= h && l <= c && c <= h)
    }
    assert(rows.map(_.getAs[Long]("n_events")).sum ===
      Tables.events(spark, sf).count())
  }

  test("q63_rfm: segment populations partition the customer base and " +
       "scores stay in 1..5") {
    val rows = RelationalQueries.q63Rfm(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCust)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Int](c); assert(v >= 1 && v <= 5)
      }
    }
  }

  test("stats_capture_recapture: estimator bounds (m <= min(n1,n2), " +
       "n_est >= max(n1,n2))") {
    val r = StatsQueries.captureRecapture(spark, sf).head()
    val (n1, n2, m) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"))
    assert(m <= math.min(n1, n2))
    assert(r.getAs[Long]("n_est") >= math.max(n1, n2))
    assert(r.getAs[Long]("n_true") >= math.max(n1, n2))
  }
}
