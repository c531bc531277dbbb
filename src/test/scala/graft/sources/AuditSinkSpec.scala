package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the V2 write path's transactional semantics — the parts the
  * hash gate can't see: manifest-as-commit bookkeeping, checksum
  * order-insensitivity, abort cleanup, and re-commit atomicity.
  */
class AuditSinkSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_audit_spec", tag)
    if (Files.exists(d)) {
      val w = Files.walk(d)
      try w.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
      finally w.close()
    }
    d.toString
  }

  private def writeRange(dir: String, n: Long, parts: Int): Unit =
    spark.range(0, n, 1, parts)
      .select(col("id").as("a"), (col("id") * 7L).as("b"))
      .write.format("graft.sources.AuditSink")
      .option("path", dir).mode("append").save()

  test("roundtrip: rows, manifest totals, and checksum all agree") {
    val dir = freshDir("roundtrip")
    writeRange(dir, 1000L, 4)
    val back = spark.read.schema("a LONG, b LONG").csv(dir).collect()
    assert(back.length === 1000)
    assert(back.map(_.getLong(0)).sorted.toSeq === (0L until 1000L).toSeq)
    val lines = Files.readAllLines(AuditSink.manifestOf(dir))
    val total = lines.get(lines.size - 1).split("\t")
    assert(total(0) === "TOTAL" && total(1).toLong === 1000L)
    val expected = back.map(r => AuditSink.rowHash(Seq(r.getLong(0),
      r.getLong(1)))).foldLeft(0L)(_ ^ _)
    assert(total(2).toLong === expected)
    // per-part rows sum to the total
    val partRows = (0 until lines.size - 1)
      .map(i => lines.get(i).split("\t")(1).toLong)
    assert(partRows.sum === 1000L)
  }

  test("the checksum is order- and partitioning-insensitive") {
    val h1 = Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L))
      .map(AuditSink.rowHash).foldLeft(0L)(_ ^ _)
    val h2 = Seq(Seq(5L, 6L), Seq(1L, 2L), Seq(3L, 4L))
      .map(AuditSink.rowHash).foldLeft(0L)(_ ^ _)
    assert(h1 === h2)
    // but NOT value-insensitive: swapping columns changes it
    assert(AuditSink.rowHash(Seq(1L, 2L)) !== AuditSink.rowHash(Seq(2L, 1L)))
  }

  test("a second write replaces the first atomically (no stale parts)") {
    val dir = freshDir("recommit")
    writeRange(dir, 1000L, 4)
    writeRange(dir, 10L, 2)
    val back = spark.read.schema("a LONG, b LONG").csv(dir)
    assert(back.count() === 10L)
    val lines = Files.readAllLines(AuditSink.manifestOf(dir))
    assert(lines.get(lines.size - 1).split("\t")(1).toLong === 10L)
  }

  test("abort removes the attempt file; commit-side abort is a no-op") {
    val dir = freshDir("abort")
    val w = new AuditWriter(dir, 2, 7, 42L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(1L, 2L))
    w.abort()
    val tmp = Paths.get(dir, "_temporary")
    val left = Files.list(tmp)
    try assert(left.count() === 0L, "abort left an attempt file behind")
    finally left.close()
  }

  test("non-long schemas are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      spark.range(1).select(col("id").cast("string").as("s"))
        .write.format("graft.sources.AuditSink")
        .option("path", freshDir("badschema")).mode("append").save()
    }
    assert(e.getMessage.contains("LONG columns only"))
  }
}
