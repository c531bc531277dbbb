package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MLlib MinHashLSH dedup path: precision 1.0 by construction (the
  * approx join filters on exact jaccard distance), recall floor vs the
  * exhaustively-computed pair set.
  */
class MllibDedupSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def exactPairs(): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ts"))
    val a = toks.toDF("a", "ta")
    val b = toks.toDF("b", "tb")
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        size(array_intersect(col("ta"), col("tb"))).as("inter"),
        size(array_union(col("ta"), col("tb"))).as("uni"))
      // INCLUSIVE >= 0.8: verified empirically — approxSimilarityJoin
      // retains boundary pairs at jaccard-distance exactly 0.2
      .where(col("inter") * 5 >= col("uni") * 4)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
  }

  test("MLlib LSH pairs: full precision, bounded recall vs exact jaccard >= 0.8") {
    val s = spark
    import s.implicits._
    val got = DedupQueries.minhashMllibPairs(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val exact = exactPairs()
    assert(exact.nonEmpty, "fixture must contain near-duplicates")
    // precision: every reported pair is a true near-dup
    assert(got.subsetOf(exact), s"false positives: ${got.diff(exact).take(5)}")
    // recall floor (8 OR-ed tables at j >= 0.8: collision prob >= 1-(1-0.8^?)...)
    val recall = got.size.toDouble / exact.size
    info(f"MLlib LSH recall = $recall%.3f (${got.size}/${exact.size})")
    assert(recall >= 0.8, f"recall $recall%.3f below floor")
  }
}
