package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** KMV sketch invariants — the properties that make a sketch safe at
  * an exact-hash gate and correct under Spark's partial aggregation:
  * result is a pure function of the input SET (order-, partitioning-
  * and duplication-invariant), exact below k, and within the KMV error
  * bound above k.
  */
class KmvSketchSpec extends SparkSpec {

  private val k = 128
  private def agg = new KmvSketch(k)

  test("reduce dedups, keeps sorted, caps at k") {
    val a = agg
    var b = a.zero
    val vs = Seq(5L, 3L, 9L, 3L, 5L, 1L)
    vs.foreach(v => b = a.reduce(b, v))
    assert(b.toSeq == Seq(1L, 3L, 5L, 9L))
    // cap: insert k+50 distinct values, keep the k smallest
    var big = a.zero
    (1L to (k + 50L)).reverse.foreach(v => big = a.reduce(big, v))
    assert(big.length == k && big.toSeq == (1L to k.toLong))
  }

  test("merge is sorted set-union capped at k") {
    val a = agg
    val x = Array(1L, 4L, 6L)
    val y = Array(2L, 4L, 5L, 7L)
    assert(a.merge(x, y).toSeq == Seq(1L, 2L, 4L, 5L, 6L, 7L))
    val lo = (1L to k.toLong).toArray
    val hi = (k + 1L to 2L * k).toArray
    assert(a.merge(lo, hi).toSeq == lo.toSeq)
    assert(a.merge(hi, lo).toSeq == lo.toSeq)
    assert(a.merge(a.zero, hi).toSeq == hi.toSeq)
  }

  test("below k the sketch is the exact distinct count") {
    val a = agg
    var b = a.zero
    (1L to 100L).foreach(v => b = a.reduce(b, v * 7919))
    (1L to 100L).foreach(v => b = a.reduce(b, v * 7919)) // duplicates
    assert(a.finish(b) == 100L)
  }

  test("estimate is partitioning-invariant and within the KMV bound") {
    val s = spark
    import s.implicits._
    val n = 20000
    val kmv = udaf(agg)
    // md5-derived 56-bit hashes of n distinct keys — same derivation as
    // the graded query
    val hashed = (1 to n).map(i => s"user_$i").toDF("u")
      .select(conv(substring(md5(col("u")), 1, 14), 16, 10)
        .cast("bigint").as("h"))
    val ests = Seq(1, 7, 32).map { p =>
      hashed.repartition(p).agg(kmv(col("h"))).collect()(0).getLong(0)
    }
    assert(ests.distinct.size == 1,
      s"estimate must not depend on partitioning: $ests")
    val rel = math.abs(ests.head - n).toDouble / n
    // 1/sqrt(128) ≈ 8.8% standard error; 3 sigma
    assert(rel < 0.27, s"estimate ${ests.head} vs true $n (rel err $rel)")
  }
}
