package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The wildcard (deletion-neighborhood) index must find EXACTLY the
  * edit-distance-1 pairs brute force finds — completeness is the whole
  * point of a blocking scheme (a blocked join that misses pairs is
  * silently wrong at any scale).
  */
class MatchQueriesSpec extends SparkSpec {

  test("wildcard-index pairs == brute-force levenshtein-1 pairs") {
    val s = spark
    import s.implicits._
    // 300 random fixed-length strings over a 4-letter alphabet: dense
    // enough that hamming-1 pairs are plentiful (~300*6*3/4^6 collisions)
    val rnd = new scala.util.Random(42)
    val names = Seq.fill(300)(
      (1 to 6).map(_ => "abcd"(rnd.nextInt(4))).mkString).distinct
    val df = names.toDF("name")
    val indexed = MatchQueries.fuzzyPairsOf(df)
      .as[(String, String)].collect().toSet
    val brute = (for {
      a <- names; b <- names
      if a < b && a.zip(b).count { case (x, y) => x != y } == 1
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture produced no pairs — weak test")
    assert(indexed == brute,
      s"missing=${(brute -- indexed).take(5)} extra=${(indexed -- brute).take(5)}")
  }

  test("each true pair is produced exactly once (no dedup needed)") {
    val s = spark
    import s.implicits._
    val df = Seq("aaaa", "aaab", "aaba", "abaa", "baaa").toDF("name")
    val rows = MatchQueries.fuzzyPairsOf(df).collect()
    assert(rows.length == rows.distinct.length)
    // "aaaa" is at distance 1 from all four others
    assert(rows.count(r => r.getString(0) == "aaaa") == 4)
  }
}
