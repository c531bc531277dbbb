package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the connector behaviors src_synthlog_* grade implicitly: the
  * graded hash proves values; these tests prove the PLAN — filters
  * pushed into the scan (not re-filtered rows), columns pruned at the
  * reader, partitions planned over the narrowed range, and statistics
  * small enough post-pushdown to flip the join to broadcast.
  */
class SynthLogSourceSpec extends SparkSpec {

  private def read(rows: Long, slices: Int = 8) =
    spark.read.format("graft.sources.SynthLogSource")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  // sparkPlan, not executedPlan: AQE wraps the latter in an adaptive
  // root whose children aren't visible to collectFirst until execution.
  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.sparkPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("row function matches the documented arithmetic") {
    val rows = read(100).orderBy("id").collect()
    assert(rows.length === 100)
    val r7 = rows(7)
    assert(r7.getLong(0) === 7L)
    assert(r7.getLong(1) === SynthLogSource.bucket(7))
    assert(r7.getLong(2) === SynthLogSource.level(7))
    assert(r7.getLong(3) === SynthLogSource.value(7))
  }

  test("id range filters are pushed and narrow the planned partitions") {
    val df = read(1000000L).where(col("id") >= 400000L && col("id") < 400100L)
    val scan = scanOf(df)
    val desc = scan.scan.description()
    assert(desc.contains("[400000, 400100)"), desc)
    assert(desc.contains("pushed="), desc)
    assert(scan.scan.asInstanceOf[SynthLogScan]
      .planInputPartitions().map { p =>
        val sp = p.asInstanceOf[SynthLogPartition]; sp.hi - sp.lo
      }.sum === 100L)
    assert(df.count() === 100L)
  }

  test("EqualTo on id narrows to a single row") {
    val df = read(1000000L).where(col("id") === 123456L)
    assert(scanOf(df).scan.description().contains("[123456, 123457)"))
    val got = df.collect()
    assert(got.length === 1 && got(0).getLong(0) === 123456L)
  }

  test("filters on computed columns stay residual and still apply") {
    val df = read(10000L).where(col("level") === 3L)
    // level isn't pushable: the scan keeps the full range...
    assert(scanOf(df).scan.description().contains("[0, 10000)"))
    // ...and Spark's residual filter still yields only level-3 rows.
    assert(df.select(min("level"), max("level")).collect()(0)
      .toSeq === Seq(3L, 3L))
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000L).select(sum(col("value")).as("s"))
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("value"))
  }

  test("partitions split the narrowed range contiguously") {
    val df = read(1000000L, slices = 7)
      .where(col("id") >= 100L && col("id") < 10100L)
    val parts = scanOf(df).scan.asInstanceOf[SynthLogScan]
      .planInputPartitions().map(_.asInstanceOf[SynthLogPartition])
    assert(parts.length === 7)
    assert(parts.head.lo === 100L && parts.last.hi === 10100L)
    parts.sliding(2).foreach { case Array(a, b) => assert(a.hi === b.lo) }
  }

  test("an empty narrowed range plans zero partitions") {
    // id >= rows: empty AT THE SOURCE but not syntactically
    // contradictory, so Catalyst can't fold it to a LocalRelation.
    val df = read(1000L).where(col("id") >= 1000L)
    assert(scanOf(df).scan.asInstanceOf[SynthLogScan]
      .planInputPartitions().isEmpty)
    assert(df.count() === 0L)
  }

  test("post-pushdown statistics flip the join to broadcast") {
    val big = read(5000000L).where(col("id") < 2000L)
    val dim = spark.range(0, 100000).select(col("id").as("k"))
    val joined = dim.join(big, col("k") === col("id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
           plan.contains("BroadcastExchange"), plan)
    assert(joined.count() === 2000L)
  }
}
