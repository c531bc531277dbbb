package graft.queries

import graft.SparkSpec

/** The graded scale path for embedding near-dup (LSH candidates →
  * exact verify → CC) measured against the exact all-pairs baseline:
  * precision must be 1.0 by construction (verified pairs are a subset
  * of the exact pair set, so ANN clusters refine exact clusters), pair
  * recall is the LSH trade and gets a floor, and the candidate plan
  * must contain no cartesian/nested-loop join — that absence is the
  * whole point of the query.
  */
class EmbeddingDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def clusters(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ANN dedup clusters refine the exact clusters (precision 1.0)") {
    val exact = clusters(DedupQueries.dedupEmbeddingClusters(spark, sfDir))
    val ann = clusters(DedupQueries.dedupEmbeddingAnn(spark, sfDir))
    assert(ann.keySet === exact.keySet, "every vector must be assigned")
    // two vectors sharing an ANN cluster must share an exact cluster
    ann.groupBy(_._2).values.foreach { members =>
      val exactLabels = members.keys.map(exact).toSet
      assert(exactLabels.size === 1,
        s"ANN cluster spans exact clusters $exactLabels")
    }
  }

  test("ANN dedup pair recall vs exact baseline has a floor") {
    val exact = clusters(DedupQueries.dedupEmbeddingClusters(spark, sfDir))
    val ann = clusters(DedupQueries.dedupEmbeddingAnn(spark, sfDir))
    val ids = exact.keys.toSeq.sorted
    val exactPairs = for {
      i <- ids; j <- ids if i < j && exact(i) == exact(j)
    } yield (i, j)
    assert(exactPairs.nonEmpty, "fixture must contain near-duplicates")
    val found = exactPairs.count { case (i, j) => ann(i) == ann(j) }
    val recall = found.toDouble / exactPairs.size
    info(f"embedding ANN cluster-pair recall = $recall%.3f ($found/${exactPairs.size})")
    assert(recall >= 0.5, f"recall $recall%.3f below floor")
  }

  test("candidate generation plan has no cartesian or nested-loop join") {
    val plan = DedupQueries.embeddingAnnPairs(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "cartesian join in ANN dedup plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested-loop join in ANN dedup plan")
  }
}
