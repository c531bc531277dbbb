package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariant checks for the curation-pipeline stages at sf0.001 (the
  * cross-engine value check is the DuckDB gate at sf0.01; these pin the
  * semantic properties a refactor could silently break).
  */
class PipelineQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("quality filter: score is the rule sum and keep is score >= 3") {
    val rows = PipelineQueries.qualityFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val score = r.getAs[Int]("r_len") + r.getAs[Int]("r_wordlen") +
        r.getAs[Int]("r_stopword") + r.getAs[Int]("r_ttr")
      assert(score === r.getAs[Int]("quality_score"))
      assert((score >= 3) === (r.getAs[Int]("keep") == 1))
    }
    val kept = rows.count(_.getAs[Int]("keep") == 1)
    assert(kept > 0 && kept < rows.length,
      s"degenerate filter: kept $kept of ${rows.length}")
  }

  test("redaction: docs with hits change their text, docs without keep it") {
    val s = spark
    val redacted = PipelineQueries.piiRedact(s, sfDir)
    val raw = Tables.documents(s, sfDir).select(col("doc_id"), md5(col("text")).as("raw_md5"))
    val joined = redacted.join(raw, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val changed = r.getAs[String]("redacted_md5") != r.getAs[String]("raw_md5")
      assert(changed === (r.getAs[Int]("n_hits") > 0),
        s"doc ${r.getAs[Long]("doc_id")}: n_hits=${r.getAs[Int]("n_hits")} changed=$changed")
    }
    assert(joined.exists(_.getAs[Int]("n_hits") > 0), "blocklist never fired")
  }

  test("sample mix is deterministic and every bucket is under its rate") {
    val a = PipelineQueries.sampleMix(spark, sfDir).collect()
    val b = PipelineQueries.sampleMix(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.nonEmpty)
    a.foreach(r => assert(r.getAs[Long]("bucket") < r.getAs[Int]("rate_pct")))
    // the 25% sources must actually be downsampled vs the 100% ones
    val bySrc = a.groupBy(_.getAs[Int]("rate_pct")).view.mapValues(_.length).toMap
    assert(bySrc(25) < bySrc(100))
  }

  test("dedup merge keeps exactly one representative per cluster") {
    val rows = PipelineQueries.dedupMerge(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    byCluster.foreach { case (c, rs) =>
      assert(rs.count(_.getAs[Int]("keep") == 1) === 1, s"cluster $c")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length), s"cluster $c size")
    }
    // representative = longest doc, doc_id tie-break
    val nChars = Tables.documents(spark, sfDir).select("doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (c, rs) =>
      val rep = rs.find(_.getAs[Int]("keep") == 1).get.getAs[Long]("doc_id")
      val best = rs.map(_.getAs[Long]("doc_id")).minBy(id => (-nChars(id), id))
      assert(rep === best, s"cluster $c rep")
    }
  }

  test("sequence packing: per-source ids contiguous from 0, capacity respected") {
    val rows = PipelineQueries.packSequences(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_id") === cum / 512, s"$src doc ${r.getAs[Long]("doc_id")}")
        cum += r.getAs[Int]("n_tokens")
      }
      val ids = sorted.map(_.getAs[Long]("seq_id"))
      assert(ids.head === 0L && ids.toSet === (0L to ids.max).toSet, s"$src gap")
    }
  }

  test("vocab top-k: ranks are dense and counts non-increasing") {
    val rows = PipelineQueries.vocabTopK(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    val counts = rows.map(_.getAs[Long]("n"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(counts.sum === Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " "))).count())
  }

  test("decontamination: flagged docs are never from the eval source") {
    val flagged = PipelineQueries.decontaminate(spark, sfDir).collect()
    assert(flagged.nonEmpty, "no contamination found — check the gram window")
    val srcOf = Tables.documents(spark, sfDir).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    flagged.foreach { r =>
      assert(srcOf(r.getAs[Long]("doc_id")) != "src0")
      assert(r.getAs[Long]("n_shared_4grams") > 0)
    }
  }

  test("token chunks partition each document's tokens exactly") {
    val s = spark
    val chunks = PipelineQueries.tokenChunks(s, sfDir).collect()
    val nTokens = Tables.documents(s, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === nTokens.keySet)
    byDoc.foreach { case (d, rs) =>
      assert(rs.map(_.getAs[Int]("n_chunk_tokens")).sum === nTokens(d), s"doc $d")
      val ids = rs.map(_.getAs[Long]("chunk_id")).sorted
      assert(ids === (0L until ids.length).toArray.toSeq, s"doc $d chunk ids")
      // every chunk but the last is full
      rs.sortBy(_.getAs[Long]("chunk_id")).dropRight(1)
        .foreach(r => assert(r.getAs[Int]("n_chunk_tokens") === 64, s"doc $d"))
    }
  }
}
