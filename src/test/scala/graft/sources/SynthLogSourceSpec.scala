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

  test("In on id becomes an explicit id-list scan with no residual") {
    // dups dedup'd, out-of-table ids dropped at build time
    val df = read(1000000L).where(col("id").isin(5L, 99L, 7L, 99L, 2000000L))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("ids(3)"), desc)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 7L, 99L))
  }

  test("In intersects with pushed range filters") {
    val df = read(1000000L)
      .where(col("id").isin(5L, 500L, 70000L) && col("id") >= 100L)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("ids(2)"), desc)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(500L, 70000L))
  }

  test("IsNotNull on a schema column is fully handled at the builder") {
    // Catalyst folds IsNotNull on non-nullable output before it reaches
    // the source, so exercise the builder contract directly.
    import org.apache.spark.sql.sources.{EqualTo, In, IsNotNull}
    val b = new SynthLogScanBuilder(100L, 4)
    val residual = b.pushFilters(Array(
      IsNotNull("id"), In("id", Array[Any](1L, 3L)), EqualTo("level", 3L)))
    assert(residual.toSeq === Seq(EqualTo("level", 3L)))
    assert(b.pushedFilters().length === 2)
  }

  test("limit pushdown truncates the scan to the first n ids") {
    val df = read(1000000L).where(col("id") >= 1000L).limit(10)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("[1000, 1010)"), desc)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq
      === (1000L until 1010L).toSeq)
  }

  test("limit composes with In: first n of the intersected sorted list") {
    val df = read(1000000L)
      .where(col("id").isin(900L, 5L, 300L, 77L, 41L)).limit(3)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("ids(3)"), desc)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 41L, 77L))
  }

  test("TopN pushdown DESC: no Sort, no Limit in the plan; rows arrive " +
       "high-to-low from one partition") {
    val df = read(5000000L).where(col("id") >= 100L)
      .orderBy(col("id").desc).limit(5)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case s if s.nodeName.contains("Sort") => s }.isEmpty,
      plan.toString)
    assert(plan.collect {
      case l if l.nodeName.contains("Limit") || l.nodeName.contains("TakeOrdered") => l
    }.isEmpty, plan.toString)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("order=id-desc"),
      scan.scan.description())
    assert(scan.scan.asInstanceOf[SynthLogScan].planInputPartitions().length === 1)
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(4999999L, 4999998L, 4999997L, 4999996L, 4999995L))
  }

  test("TopN pushdown ASC narrows to the interval head") {
    val df = read(5000000L).where(col("id") >= 1000L)
      .orderBy(col("id").asc).limit(3)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect { case s if s.nodeName.contains("Sort") => s }.isEmpty,
      plan.toString)
    assert(scanOf(df).scan.description().contains("[1000, 1003)"),
      scanOf(df).scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1000L, 1001L, 1002L))
  }

  test("OFFSET pushdown under an ASC TopN: no Sort, no Limit, no Offset " +
       "in the plan; the keyspace head shifts by the offset") {
    val df = read(5000000L).where(col("id") >= 100L)
      .orderBy(col("id").asc).offset(37).limit(5)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect {
      case s if s.nodeName.contains("Sort") || s.nodeName.contains("Offset") ||
                s.nodeName.contains("Limit") => s
    }.isEmpty, plan.toString)
    assert(scanOf(df).scan.description().contains("[137, 142)"),
      scanOf(df).scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(137L, 138L, 139L, 140L, 141L))
  }

  test("OFFSET pushdown under a DESC TopN skips from the HIGH end") {
    val df = read(5000000L).where(col("id") >= 100L)
      .orderBy(col("id").desc).offset(37).limit(5)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect {
      case s if s.nodeName.contains("Sort") || s.nodeName.contains("Offset") => s
    }.isEmpty, plan.toString)
    assert(scanOf(df).scan.description().contains("[4999958, 4999963)"),
      scanOf(df).scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq ===
      Seq(4999962L, 4999961L, 4999960L, 4999959L, 4999958L))
  }

  test("a bare OFFSET (no sort, no limit) is pushed as a keyspace shift") {
    val df = read(1000L).offset(997)
    val plan = df.queryExecution.sparkPlan
    assert(plan.collect {
      case s if s.nodeName.contains("Offset") => s }.isEmpty, plan.toString)
    assert(scanOf(df).scan.description().contains("[997, 1000)"),
      scanOf(df).scan.description())
    assert(df.collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(997L, 998L, 999L))
  }

  test("an OFFSET arriving after a pushed aggregate is REFUSED — group " +
       "rows stay intact (the agg_limit hazard, offset path)") {
    val df = read(5000L, slices = 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("bucket").offset(3)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("synthlog-agg"), desc)
    // the un-truncated 5-bucket group set, minus the 3 Spark skips ABOVE
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((3L, 1000L, 3000L, 3999L), (4L, 1000L, 4000L, 4999L)))
  }

  test("TopN on a computed column is refused — Spark keeps its sort " +
       "and the values are right") {
    val df = read(10000L).orderBy(col("value").desc).limit(3)
    assert(!scanOf(df).scan.description().contains("order="),
      scanOf(df).scan.description())
    val expect = (0L until 10000L).map(SynthLogSource.value)
      .sorted(Ordering[Long].reverse).take(3)
    assert(df.collect().map(_.getLong(3)).toSeq === expect)
  }

  test("a TopN arriving after a pushed aggregate is REFUSED — group " +
       "values stay intact (the agg_limit hazard, sort path)") {
    val df = read(5000L, slices = 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy(col("bucket").desc).limit(2)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("group=bucket"), desc)
    assert(desc.contains("[0, 5000)"), desc) // keyspace untouched
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(4L, 3L))
    assert(rows.forall(_.getLong(1) === 1000L), rows.map(_.toSeq).mkString(";"))
  }

  test("src_synthlog_limit's graded scan shows the truncated id list") {
    val df = graft.queries.IoQueries.synthlogLimit(spark, "unused")
    val desc = df.queryExecution.sparkPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse(fail("no scan"))
    assert(desc.contains("ids(25)"), desc)
  }

  test("aggregate pushdown answers count/min/max from metadata") {
    val df = read(50000000L)
      .where(col("id") >= 1000000L && col("id") < 42000000L)
      .agg(count(lit(1)).as("n"), min("id"), max("id"))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("synthlog-agg"), desc)
    // complete pushdown: no HashAggregate left in the plan
    assert(df.queryExecution.sparkPlan.collect {
      case p if p.nodeName.contains("HashAggregate") => p
    }.isEmpty, df.queryExecution.sparkPlan.toString)
    val row = df.collect()(0)
    assert(row.getLong(0) === 41000000L)
    assert(row.getLong(1) === 1000000L && row.getLong(2) === 41999999L)
  }

  test("aggregate pushdown on an empty range: count 0, null min/max") {
    val df = read(1000L).where(col("id") >= 1000L)
      .agg(count(lit(1)).as("n"), min("id"), max("id"))
    assert(scanOf(df).scan.description().contains("synthlog-agg"))
    val row = df.collect()(0)
    assert(row.getLong(0) === 0L && row.isNullAt(1) && row.isNullAt(2))
  }

  test("aggregate pushdown composes with an In list") {
    val df = read(1000000L).where(col("id").isin(7L, 3L, 500000L))
      .agg(count(lit(1)).as("n"), min("id"), max("id"))
    assert(scanOf(df).scan.description().contains("synthlog-agg"))
    val row = df.collect()(0)
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === 3L && row.getLong(2) === 500000L)
  }

  test("GROUP BY bucket aggregate pushdown streams closed-form rows") {
    val df = read(5000000L)
      .where(col("id") >= 1500L && col("id") < 12500L)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("group=bucket"), desc)
    assert(df.queryExecution.sparkPlan.collect {
      case p if p.nodeName.contains("HashAggregate") => p
    }.isEmpty, df.queryExecution.sparkPlan.toString)
    val rows = df.orderBy("bucket").collect()
    assert(rows.length === 12) // buckets 1..12
    assert(rows.head.toSeq === Seq(1L, 500L, 1500L, 1999L))
    assert(rows.last.toSeq === Seq(12L, 500L, 12000L, 12499L))
    assert(rows.map(_.getLong(1)).sum === 11000L)
  }

  test("GROUP BY bucket pushdown composes with an In list") {
    val df = read(1000000L).where(col("id").isin(5L, 7L, 1500L, 999999L))
      .groupBy("bucket").agg(count(lit(1)).as("n"), max("id").as("mx"))
    assert(scanOf(df).scan.description().contains("group=bucket"))
    val rows = df.orderBy("bucket").collect().map(_.toSeq)
    assert(rows === Array(Seq(0L, 2L, 7L), Seq(1L, 1L, 1500L),
      Seq(999L, 1L, 999999L)))
  }

  test("a limit arriving after an aggregate is pushed is REFUSED — " +
       "group values stay intact") {
    // Spark pushes limits after aggregates; accepting one here would
    // truncate the pre-aggregation keyspace and corrupt every group.
    val df = read(5000L, slices = 4)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .limit(10)
    val desc = scanOf(df).scan.description()
    assert(desc.contains("group=bucket"), desc)
    // the base scan keeps its full keyspace (no limit-truncation to
    // [0, 10)); all 5 buckets report their true 1000-row counts
    assert(desc.contains("[0, 5000)"), desc)
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(1) === 1000L),
      rows.map(_.toSeq).mkString(";"))
    assert(rows.head.toSeq === Seq(0L, 1000L, 0L, 999L))
    // ungrouped: one row either way, but the limit must still not
    // touch the keyspace
    val g = read(5000L).agg(count(lit(1)).as("n")).limit(1)
    assert(g.collect()(0).getLong(0) === 5000L)
  }

  test("GROUP BY on a non-bucket column falls back to a plain scan") {
    val df = read(10000L).groupBy("level").agg(count(lit(1)).as("n"))
    assert(!scanOf(df).scan.description().contains("synthlog-agg"))
    assert(df.collect().map(_.getLong(1)).sum === 10000L)
  }

  test("unsupported aggregates fall back to a plain scan") {
    val df = read(10000L).agg(sum("value").as("s"))
    val desc = scanOf(df).scan.description()
    assert(!desc.contains("synthlog-agg"), desc)
    assert(df.collect()(0).getLong(0) ===
      (0L until 10000L).map(SynthLogSource.value).sum)
  }

  test("storage-partitioned join: two bucketed scans join with ZERO " +
       "exchanges and correct values") {
    val sc = spark
    sc.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    sc.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def t = spark.read.format("graft.sources.SynthLogSource")
        .option("rows", "3000").option("bucketed", "true").load()
      val a = t.select(col("bucket"), col("id").as("ida"))
      val b = t.select(col("bucket"), col("id").as("idb"))
      val joined = a.join(b, Seq("bucket"))
      val exec = joined.queryExecution.executedPlan
      val exchanges = exec.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"SPJ should plan zero shuffles, got:\n$exec")
      // per-bucket cross products: 3 buckets × 1000² rows
      assert(joined.count() === 3L * 1000L * 1000L)
      // partition keys align: per-bucket counts are exact
      val per = joined.groupBy("bucket").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(per === Map(0L -> 1000000L, 1L -> 1000000L, 2L -> 1000000L))
      // the scan advertises the bucketed form
      val desc = scanOf(a).scan.description()
      assert(desc.contains("synthlog-bucketed"), desc)
      // pruning `bucket` away must fall back to the plain scan (the
      // reported partitioning names bucket and is resolved against
      // the PRUNED output — advertising it would fail the query)
      val pruned = t.select(col("value"))
      assert(!scanOf(pruned).scan.description().contains("synthlog-bucketed"))
      assert(pruned.agg(sum(col("value"))).collect()(0).getLong(0) ===
        (0L until 3000L).map(SynthLogSource.value).sum)
    } finally {
      sc.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      sc.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("runtime V2 filtering narrows the scan to the dim side's ids") {
    // No STATIC id predicate on the big side: the only way the source
    // can avoid generating 5M rows is the runtime IN filter Spark
    // derives from the broadcast dim (SupportsRuntimeV2Filtering).
    val sc = spark
    sc.conf.set("spark.sql.adaptive.enabled", "false") // walkable tree
    try {
      val big = read(5000000L).select(col("id"), col("value"))
      val dim = spark.range(0, 4000).where(col("id") % 40 === 0)
        .select(col("id").as("k")) // 100 selective keys behind a Filter
      val joined = big.join(dim.hint("broadcast"), col("id") === col("k"))
      // collect(), not count(): metrics must come from THIS plan instance
      assert(joined.collect().length === 100)
      val slog = joined.queryExecution.executedPlan.collect {
        case b: BatchScanExec if b.scan.isInstanceOf[SynthLogScan] => b
      }
      assert(slog.nonEmpty, "no synthlog scan in executed plan")
      assert(slog.head.runtimeFilters.nonEmpty,
        "planner did not attach a runtime filter to the scan")
      val emitted = slog.head.metrics("numOutputRows").value
      assert(emitted === 100L,
        s"source emitted $emitted rows — runtime filter did not narrow")
    } finally sc.conf.set("spark.sql.adaptive.enabled", "true")
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
