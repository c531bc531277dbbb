package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcCutsSpec extends SparkSpec {

  /** Naive O(n*W) per-position polynomial — the oracle's formulation. */
  private def naiveCuts(s: String): Seq[Int] = {
    val b = s.getBytes("UTF-8")
    val pows = Iterator.iterate(1L)(_ * CdcCuts.Base % CdcCuts.Mod)
      .take(CdcCuts.Window).toArray.reverse
    (1 to b.length - CdcCuts.Window + 1).filter { i =>
      val h = (0 until CdcCuts.Window)
        .map(k => (b(i - 1 + k) & 0xffL) * pows(k) % CdcCuts.Mod)
        .sum % CdcCuts.Mod
      h % CdcCuts.Div == 0
    }
  }

  private def sparkCuts(texts: Seq[String]): Seq[Seq[Int]] = {
    val s = spark; import s.implicits._
    texts.toDF("text").select(CdcCuts(col("text")).as("cuts"))
      .collect().map(_.getSeq[Int](0)).toSeq
  }

  test("rolling hash matches the per-position polynomial (seeded random)") {
    val rnd = new scala.util.Random(42)
    val texts = (0 until 60).map { _ =>
      val len = rnd.nextInt(400)
      (0 until len).map(_ => (32 + rnd.nextInt(95)).toChar).mkString
    }
    assert(sparkCuts(texts) === texts.map(naiveCuts))
  }

  test("matches on real corpus text and finds ~len/32 cuts") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").limit(20).select("text")
      .collect().map(_.getString(0)).toSeq
    val got = sparkCuts(docs)
    docs.zip(got).foreach { case (t, cuts) =>
      assert(cuts === naiveCuts(t))
      // expected spacing 32; just pin the right order of magnitude
      if (t.length > 2000) {
        assert(cuts.size > t.length / 320, s"far too few cuts: ${cuts.size}")
        assert(cuts.size < t.length / 4, s"far too many cuts: ${cuts.size}")
      }
    }
  }

  test("short and empty strings yield no cuts; cuts are sorted distinct") {
    assert(sparkCuts(Seq("", "short", "1234567")) === Seq(Nil, Nil, Nil))
    val t = "x" * 500 + "content defined chunking " * 40
    val cuts = sparkCuts(Seq(t)).head
    assert(cuts === cuts.sorted && cuts.distinct === cuts)
    assert(cuts.forall(i => i >= 1 && i <= t.length - 7))
  }

  test("boundaries are content-defined: prefix insertion preserves later cuts") {
    val t = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(4000).mkString
    val shifted = "INSERTED" + t
    val a = sparkCuts(Seq(t)).head.toSet
    val b = sparkCuts(Seq(shifted)).head.map(_ - 8).toSet
    // all original cuts past the first window must reappear shifted by 8
    val stable = a.filter(_ > CdcCuts.Window)
    assert(stable.nonEmpty && stable.subsetOf(b))
  }
}
