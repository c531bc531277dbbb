package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The property that justifies content-defined (vs fixed-width)
  * chunking: boundaries depend on local content, so a prefix insertion
  * — which shifts EVERY byte offset — leaves most chunk hashes
  * unchanged. Fixed-width blocks share (almost) nothing after a
  * 1-char shift.
  */
class CdcDedupSpec extends SparkSpec {

  private def chunkSet(texts: Seq[String]): Seq[Set[String]] = {
    val s = spark; import s.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    DedupQueries.cdcChunks(df).orderBy("doc_id")
      .collect().map(_.getSeq[String](1).toSet).toSeq
  }

  test("CDC chunks survive a prefix insertion; fixed blocks do not") {
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .orderBy("doc_id").select("text").limit(5)
      .collect().map(_.getString(0)).filter(_.length > 300)
    assert(base.nonEmpty)
    base.foreach { t =>
      val Seq(a, b) = chunkSet(Seq(t, "inserted prefix 12345 " + t))
      val shared = a.intersect(b).size.toDouble / a.size
      assert(shared > 0.5,
        f"CDC chunks lost to a prefix shift: only ${shared * 100}%.0f%% shared")
      // contrast: fixed 32-char blocks after the same shift
      val fixed = (s: String) => s.grouped(32).toSet
      val fshared = fixed(t).intersect(fixed("inserted prefix 12345 " + t)).size
      assert(fshared <= 1, s"fixed blocks unexpectedly robust: $fshared")
    }
  }

  test("pairs are symmetric-free, thresholded, and deterministic") {
    val rows = DedupQueries.cdcChunkPairs(spark, "/root/testdata/sf0.001")
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared") >= 2)
    }
    val again = DedupQueries.cdcChunkPairs(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
