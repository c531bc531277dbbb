package graft.operators

import graft.SparkSpec

/** Salted join correctness: exact multiset equality with the plain
  * equi-join on a hot-key distribution, including multiplicities.
  */
class SkewJoinSpec extends SparkSpec {

  test("salted equi-join equals plain join on a skewed distribution") {
    val s = spark
    import s.implicits._
    // 10k rows of hot key 1, a tail of keys 2..50, plus keys absent
    // from the small side
    val big = ((1 to 10000).map(i => (1L, i)) ++
               (2 to 50).flatMap(k => (1 to 5).map(i => (k.toLong, i))) ++
               Seq((999L, 0))).toDF("k", "v")
    // small side with duplicate keys to exercise multiplicities
    val small = Seq((1L, "a"), (1L, "b"), (2L, "c"), (50L, "d"), (777L, "e"))
      .toDF("k", "w")

    val plain = big.join(small, Seq("k")).groupBy("k", "v", "w").count()
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", factor = 8)
      .groupBy("k", "v", "w").count()
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
    assert(salted.agg(org.apache.spark.sql.functions.sum("count")).first().getLong(0)
      === 2L * 10000 + 5 + 5) // hot key twice, k=2 and k=50 tails once
  }

  test("factor = 1 degenerates to the plain join") {
    val s = spark
    import s.implicits._
    val big = Seq((1L, 10), (2L, 20)).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val got = SkewJoin.saltedEquiJoin(big, small, "k", factor = 1)
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((1L, 10, "x")))
  }
}
