package graft.multimodal

import org.apache.spark.sql.types._

import graft.SparkSpec

/** Multimodal plumbing: typed schema of the media table, the decode
  * boundary (batch-per-partition, deterministic), and stub-codec frame
  * arithmetic.
  */
class MultimodalSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("media table schema: opaque binary payload + typed metadata struct") {
    val schema = MultimodalQueries.mediaTable(spark, sfDir).schema
    assert(schema("payload").dataType === BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta("media_type").dataType === StringType)
    assert(meta("width").dataType === IntegerType)
    assert(meta("height").dataType === IntegerType)
    assert(meta("n_frames").dataType === IntegerType)
  }

  test("decode boundary preserves partitioning and is deterministic") {
    val ds = MultimodalQueries.mediaTable(spark, sfDir).repartition(7)
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    val dec = ds.mapPartitions(_.map(MultimodalQueries.StubCodec.decode))
    assert(dec.rdd.getNumPartitions === 7) // mapPartitions is narrow
    val a = dec.toDF().select("doc_id", "byte_sum").as[(Long, Long)].collect().sorted
    val b = dec.toDF().select("doc_id", "byte_sum").as[(Long, Long)].collect().sorted
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stub codec: frame slices tile the payload with even indices only") {
    val meta = MultimodalQueries.MediaMeta("video", 20, 20, 5)
    val payload = (0 until 53).map(_.toByte).toArray
    val d = MultimodalQueries.StubCodec.decode(
      MultimodalQueries.MediaRow(42L, payload, meta))
    val flen = 53 / 5
    assert(d.frames.map(_.frame_idx) === Seq(0, 2, 4))
    d.frames.foreach { f =>
      assert(f.frame_off === f.frame_idx * flen)
      assert(f.frame_len === flen)
      assert(f.bytes.toSeq === payload.slice(f.frame_off, f.frame_off + flen).toSeq)
    }
    // audio rows produce no frames; resize decimates 2:1 keeping even offsets
    val a = MultimodalQueries.StubCodec.decode(
      MultimodalQueries.MediaRow(1L, payload, meta.copy(media_type = "audio")))
    assert(a.frames.isEmpty)
    assert(a.resized.toSeq === payload.indices.collect {
      case i if i % 2 == 0 => payload(i) }.toSeq)
  }

  test("phash clustering partitions the corpus, labels are cluster minima") {
    val rows = MultimodalQueries.mediaPhashClusters(spark, sfDir).collect()
    val docs = graft.queries.Tables.documents(spark, sfDir).count()
    assert(rows.length === docs, "every media doc gets exactly one label")
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (label, members) =>
      assert(members.map(_.getAs[Long]("doc_id")).min === label,
        s"cluster $label not labeled by its min member")
    }
    assert(byCluster.exists(_._2.length > 1),
      "corpus has near-dup families; clustering found none")
  }
}
