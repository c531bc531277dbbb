package graft.queries

import graft.SparkSpec

/** ANN quality: both approximate paths (random-hyperplane LSH, IVF
  * nprobe) are measured against the exact brute-force top-k. These are
  * recall assertions — the whole point of an ANN index is trading exact
  * recall for candidate-set size, so we pin the floor observed on the
  * deterministic testdata rather than demanding equality.
  */
class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getLong(r.fieldIndex("query_id")), r.getLong(r.fieldIndex("neighbor_id")),
                 r.getInt(r.fieldIndex("rank"))))
      .filter(_._3 <= k)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallAtK(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]], k: Int): Double = {
    val per = exact.keys.toSeq.map { q =>
      approx.getOrElse(q, Set.empty).intersect(exact(q)).size.toDouble / k
    }
    per.sum / per.size
  }

  test("IVF ANN recall@3 vs brute force is high on testdata") {
    val exact = topk(SimilarityQueries.topkBruteForce(spark, sfDir), 3)
    val ivf = topk(SimilarityQueries.annIvf(spark, sfDir), 3)
    val r = recallAtK(ivf, exact, 3)
    info(f"IVF recall@3 = $r%.3f")
    assert(r >= 0.5, f"IVF recall@3 $r%.3f below floor")
  }

  test("LSH ANN recall@3 vs brute force is non-trivial on testdata") {
    val exact = topk(SimilarityQueries.topkBruteForce(spark, sfDir), 3)
    val lsh = topk(SimilarityQueries.annLsh(spark, sfDir), 3)
    val r = recallAtK(lsh, exact, 3)
    info(f"LSH recall@3 = $r%.3f")
    assert(r >= 0.4, f"LSH recall@3 $r%.3f below floor")
  }

  test("every ANN result cosine matches the exact cosine (rerank is exact)") {
    val s = spark
    import s.implicits._
    val exact = SimilarityQueries.topkBruteForce(spark, sfDir)
      .select("query_id", "neighbor_id", "cos4").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    SimilarityQueries.annIvf(spark, sfDir)
      .select("query_id", "neighbor_id", "cos4").as[(Long, Long, Double)]
      .collect().foreach { case (q, n, c) =>
        exact.get((q, n)).foreach(e => assert(e === c, s"cosine mismatch for ($q,$n)"))
      }
  }
}
