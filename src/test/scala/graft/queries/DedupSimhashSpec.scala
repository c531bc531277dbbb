package graft.queries

import graft.SparkSpec

/** Semantic invariants of the banded-SimHash clustering (cross-engine
  * values are pinned by the DuckDB gate at sf0.01).
  */
class DedupSimhashSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("simhash clusters: valid partition labeled by min member") {
    val rows = DedupQueries.dedupSimhashClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.length === nDocs)                     // every doc labeled once
    rows.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min === c, s"cluster $c not labeled by min member")
    }
    assert(rows.groupBy(_._2).exists(_._2.length > 1), "no nontrivial cluster")
  }

  test("identical fingerprints sharing a cold band share a cluster") {
    val fps = DedupQueries.dedupSimhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))) // doc, fp
    val clusters = DedupQueries.dedupSimhashClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // band occupancy exactly as the query computes it: two 16-bit halves
    val occupancy = fps.flatMap { case (_, fp) =>
      Seq(0L * 65536 + (fp & 0xffffL), 1L * 65536 + ((fp >> 16) & 0xffffL))
    }.groupBy(identity).view.mapValues(_.length).toMap
    val coldFp = fps.filter { case (_, fp) =>
      occupancy(0L * 65536 + (fp & 0xffffL)) <= 256 ||
      occupancy(1L * 65536 + ((fp >> 16) & 0xffffL)) <= 256
    }
    val checked = coldFp.groupBy(_._2).values.filter(_.length > 1)
    assert(checked.nonEmpty, "no identical-fp group with a cold band to check")
    checked.foreach { g =>
      val cs = g.map(t => clusters(t._1)).distinct
      assert(cs.length === 1,
        s"equal-fp docs ${g.map(_._1).toSeq} split across ${cs.toSeq}")
    }
  }
}
