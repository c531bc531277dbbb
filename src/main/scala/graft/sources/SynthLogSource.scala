package graft.sources

import java.util.{List => JList}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.{
  Expressions, Literal, NamedReference, SortDirection, SortOrder}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{
  Batch, HasPartitionKey, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder,
  Statistics, SupportsPushDownAggregates, SupportsPushDownFilters,
  SupportsPushDownLimit, SupportsPushDownOffset,
  SupportsPushDownRequiredColumns, SupportsPushDownTopN,
  SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{
  EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan,
  LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A full DataSourceV2 `TableProvider` for a deterministic synthetic
  * log table — the "custom source" half of the engine surface, next to
  * the parquet/csv/json/orc readers exercised by `IoQueries` and the
  * reference's text/generator sources (CCDriver.scala:48-58,
  * CliquesGenerator.scala:47-66, whose sources are a text file and a
  * parallelized collection; this is the Spark-4-native connector-API
  * counterpart).
  *
  * The table is `rows` rows keyed by `id ∈ [0, rows)`; every other
  * column is a pure integer function of `id`, so any engine that can
  * enumerate a range can replay it exactly — which is what makes the
  * source oracle-gradable in DuckDB (`range(0, rows)` + the same
  * arithmetic; all values stay far inside int64).
  *
  * What makes it a real source rather than a `spark.range` alias:
  *
  *   - '''Column pruning''' (`SupportsPushDownRequiredColumns`): the
  *     reader materializes only the pruned columns; a count over one
  *     column never computes the others.
  *   - '''Filter pushdown''' (`SupportsPushDownFilters`): range
  *     comparisons and equality on `id` narrow the generated interval
  *     BEFORE partition planning — the source never emits a row just
  *     to have it filtered out. Pushed `id` filters are fully handled
  *     (returned residual set excludes them); filters on computed
  *     columns stay residual and Spark re-evaluates them.
  *   - '''Partition planning''': the (narrowed) interval splits into
  *     `slices` contiguous `InputPartition`s, so parallelism survives
  *     pushdown and a pruned scan plans proportionally less work.
  *   - '''Statistics''' (`SupportsReportStatistics`): sizeInBytes /
  *     rowCount reflect the NARROWED range, so Catalyst's
  *     broadcast-threshold and AQE decisions see the post-pushdown
  *     cardinality — a heavily-filtered scan becomes broadcast-able
  *     even when the unfiltered table would not be.
  *
  * At 100 TB the pattern is the one every warehouse connector uses:
  * pushdown narrows the scan at the metadata layer, partitions are
  * planned over the narrowed keyspace, and per-partition readers are
  * independent (no driver state beyond the range bounds).
  */
class SynthLogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthLogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SynthLogTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt,
      properties.getOrDefault("bucketed", "false").toBoolean)
}

object SynthLogSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("level", LongType, nullable = false),
    StructField("value", LongType, nullable = false)))

  /** The row function: everything is derived from `id` with arithmetic
    * DuckDB replays verbatim (ids stay < 2^24, so the LCG product is
    * < 2^55 — no overflow on either engine, ANSI-safe).
    */
  @inline def hash(id: Long): Long = (id * 1103515245L + 12345L) % 2147483648L
  @inline def bucket(id: Long): Long = id / 1000L
  @inline def level(id: Long): Long = hash(id) % 8L
  @inline def value(id: Long): Long = (hash(id) * 31L + id) % 1000000L

  /** The same row function as SQL over DuckDB's `range(0, rows)` —
    * splice into oracle queries as the table source.
    */
  def oracleTable(rows: Long): String =
    s"""(SELECT id, id // 1000 AS bucket,
       |        ((id * 1103515245 + 12345) % 2147483648) % 8 AS level,
       |        (((id * 1103515245 + 12345) % 2147483648) * 31 + id) % 1000000 AS value
       |   FROM range(0, $rows) t(id))""".stripMargin
}

private[sources] class SynthLogTable(rows: Long, slices: Int,
    bucketed: Boolean) extends Table with SupportsRead {
  override def name(): String = s"synthlog($rows)"
  override def schema(): StructType = SynthLogSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthLogScanBuilder(rows, slices, bucketed)
}

/** Accumulates pruning + pushdown state, then freezes into a
  * [[SynthLogScan]]. `lo`/`hi` is the half-open id interval after all
  * pushed `id` filters are intersected.
  */
private[sources] class SynthLogScanBuilder(rows: Long, slices: Int,
    bucketed: Boolean = false)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset
    with SupportsPushDownAggregates {

  private var lo: Long = 0L
  private var hi: Long = rows
  // Explicit id list once an `In("id", …)` arrives; intersected with
  // every other pushed filter at build time.
  private var inIds: Option[Array[Long]] = None
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  // ORDER BY id [DESC] LIMIT n, accepted by pushTopN: (descending, n).
  private var topN: Option[(Boolean, Int)] = None
  private var pushed: ArrayBuffer[Filter] = ArrayBuffer.empty
  private var required: StructType = SynthLogSource.schema

  private def longOf(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case l: java.lang.Long => Some(l.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = ArrayBuffer[Filter]()
    filters.foreach {
      case f @ EqualTo("id", v) if longOf(v).isDefined =>
        val l = longOf(v).get
        lo = math.max(lo, l); hi = math.min(hi, l + 1); pushed += f
      case f @ GreaterThan("id", v) if longOf(v).isDefined =>
        lo = math.max(lo, longOf(v).get + 1); pushed += f
      case f @ GreaterThanOrEqual("id", v) if longOf(v).isDefined =>
        lo = math.max(lo, longOf(v).get); pushed += f
      case f @ LessThan("id", v) if longOf(v).isDefined =>
        hi = math.min(hi, longOf(v).get); pushed += f
      case f @ LessThanOrEqual("id", v) if longOf(v).isDefined =>
        hi = math.min(hi, longOf(v).get + 1); pushed += f
      case f @ In("id", vs) if vs.nonEmpty && vs.forall(longOf(_).isDefined) =>
        val s = vs.flatMap(longOf).distinct.sorted
        inIds = Some(inIds.fold(s)(prev => prev.intersect(s)))
        pushed += f
      case f @ IsNotNull(attr)
          if SynthLogSource.schema.fieldNames.contains(attr) =>
        // every column is non-nullable — the filter is vacuously true;
        // swallow it so it neither narrows nor survives as residual
        pushed += f
      case other => residual += other
    }
    residual.toArray
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Rows leave the source in ascending-id order across contiguous
    * partitions, so truncating the keyspace to its first `n` ids IS the
    * limit — fully pushed, nothing partial. BUT only while the scan
    * still emits data rows: Spark pushes limits AFTER aggregates
    * (V2ScanRelationPushDown), so a limit arriving once an aggregation
    * is pushed ranges over GROUP rows — truncating the pre-aggregation
    * keyspace then would silently corrupt every group's values. Refuse
    * it; Spark keeps its own Limit above the scan.
    */
  override def pushLimit(n: Int): Boolean = {
    if (aggFuncs.isDefined) return false
    limit = Some(limit.fold(n)(math.min(_, n)))
    true
  }

  /** ORDER BY id [ASC|DESC] LIMIT n, answered CLOSED-FORM over the
    * narrowed keyspace: ids leave the source sorted by construction, so
    * the top-n is the first (ASC) or last-reversed (DESC) n ids of the
    * pushed interval — no sort ever runs, anywhere. COMPLETE pushdown
    * (`isPartiallyPushed = false`): the scan emits exactly the n rows
    * in the requested order from one partition, and Spark drops both
    * its Sort and its Limit.
    *
    * Refused — Spark keeps its own TopN above the scan — when:
    *   - an aggregation is already pushed (the TopN would range over
    *     GROUP rows; truncating the pre-aggregation keyspace is the
    *     wrong-results hazard `pushLimit` refuses for the same reason);
    *   - an `In`-list is pushed (the list scan's min/max stats assume
    *     ascending storage order — keep the two paths orthogonal);
    *   - the sort key is anything but the single column `id` (computed
    *     columns are not monotone in id).
    */
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    if (aggFuncs.isDefined || inIds.isDefined || limit.isDefined) return false
    if (orders.length != 1 || !idField(orders(0).expression())) return false
    topN = Some((orders(0).direction() == SortDirection.DESCENDING, n))
    true
  }
  /** OFFSET k, answered CLOSED-FORM like the limit: rows leave the
    * source in ascending-id order (descending for an accepted DESC
    * TopN), so skipping the first k rows is a keyspace-endpoint shift.
    * Spark pushes OFFSET only after any LIMIT above it was pushed
    * COMPLETELY (V2ScanRelationPushDown), and always as "skip k of the
    * scan's output" — so at build time the limit first truncates the
    * interval (it arrived as limit+offset for `LIMIT l OFFSET k`
    * shapes), then the offset advances the emitting end: lo for
    * ascending scans, hi for DESC-TopN scans, `drop(k)` for In-lists.
    * Refused after a pushed aggregate — an offset over GROUP rows
    * cannot be expressed as a keyspace shift (same hazard family as
    * `pushLimit`/`pushTopN`, spec-pinned).
    */
  override def pushOffset(n: Int): Boolean = {
    if (aggFuncs.isDefined) return false
    offset = Some(offset.fold(n)(_ + n))
    true
  }

  /** Complete ONLY for an accepted TopN (the scan then emits exactly
    * the n rows in order and Spark drops its Sort and Limit). The same
    * method also answers for `SupportsPushDownLimit`, so it must stay
    * `true` when only a plain limit was pushed: today every limit path
    * emits exactly ≤ n rows too, but keeping Spark's Limit above the
    * scan costs nothing and is the safety net if a future path ever
    * emits a superset (code-review r10).
    */
  override def isPartiallyPushed(): Boolean = topN.isEmpty

  // Aggregate pushdown: COUNT(*)/COUNT(col)/MIN(id)/MAX(id) with no
  // GROUP BY are CLOSED-FORM over the narrowed keyspace — the same
  // metadata-answer trick a parquet/Delta connector plays with footer
  // stats, except here it is exact by construction. COUNT(col) = n for
  // every column (all non-nullable). Complete pushdown: the scan emits
  // ONE final row; Spark plans a Project, no re-aggregation.
  private var aggFuncs: Option[Seq[String]] = None

  private def idField(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case f: NamedReference => f.fieldNames.sameElements(Array("id"))
    case _ => false
  }
  private def anyField(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case f: NamedReference => f.fieldNames.length == 1 &&
      SynthLogSource.schema.fieldNames.contains(f.fieldNames.head)
    case _ => false
  }

  private var aggByBucket: Boolean = false

  private def bucketField(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case f: NamedReference => f.fieldNames.sameElements(Array("bucket"))
    case _ => false
  }

  /** Supported shapes: no GROUP BY, or GROUP BY bucket — both closed
    * form (`bucket = id div 1000` partitions the keyspace into
    * contiguous runs, so per-bucket count/min/max are interval
    * overlaps).
    */
  private def compileAgg(agg: Aggregation): Option[(Seq[String], Boolean)] = {
    val grouped = agg.groupByExpressions.toSeq match {
      case Seq() => Some(false)
      case Seq(g) if bucketField(g) => Some(true)
      case _ => None
    }
    if (grouped.isEmpty) return None
    val funcs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case c: Count if !c.isDistinct && anyField(c.column) => Some("count")
      case m: Min if idField(m.column) => Some("min")
      case m: Max if idField(m.column) => Some("max")
      case _ => None
    }
    if (funcs.forall(_.isDefined)) Some((funcs.map(_.get), grouped.get))
    else None
  }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    compileAgg(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    compileAgg(agg) match {
      case Some((fs, byBucket)) =>
        aggFuncs = Some(fs); aggByBucket = byBucket; true
      case None => false
    }

  override def build(): Scan = {
    val l = math.min(lo, hi)
    val scan = inIds match {
      case Some(ids0) =>
        val ids1 = ids0.filter(id => id >= l && id < hi)
        val ids2 = limit.fold(ids1)(ids1.take)
        val ids = offset.fold(ids2)(ids2.drop)
        new SynthLogScan(0L, 0L, slices, required, pushed.toArray, Some(ids))
      // bucketed form only while `bucket` survives column pruning:
      // the reported KeyGroupedPartitioning names it, and Spark
      // resolves that reference against the PRUNED scan output —
      // advertising a dropped column fails the whole query
      case None if bucketed && limit.isEmpty && topN.isEmpty &&
          offset.isEmpty && aggFuncs.isEmpty &&
          required.fieldNames.contains("bucket") =>
        new SynthLogBucketedScan(l, hi, required, pushed.toArray)
      case None =>
        topN match {
          case Some((desc, n)) =>
            // the top-n of a sorted keyspace is an interval endpoint:
            // one partition, emitted in the requested order; a pushed
            // offset then skips from the EMITTING end (hi for DESC)
            val (tl0, th0) =
              if (desc) (math.max(l, hi - n), hi)
              else (l, math.min(hi, l + n))
            val (tl, th) = offset.fold((tl0, th0)) { o =>
              if (desc) (tl0, math.max(th0 - o, tl0))
              else (math.min(tl0 + o, th0), th0)
            }
            new SynthLogScan(tl, th, 1, required, pushed.toArray, None, desc)
          case None =>
            // limit first (it arrived as limit+offset when both were
            // pushed), then offset advances the low end
            val h = limit.fold(hi)(n => math.min(hi, l + n))
            val l2 = offset.fold(l)(o => math.min(l + o, h))
            new SynthLogScan(l2, h, slices, required, pushed.toArray, None)
        }
    }
    aggFuncs match {
      case Some(fs) => new SynthLogAggScan(scan, fs, aggByBucket)
      case None => scan
    }
  }
}

/** The `bucketed=true` form of the scan: one input partition PER
  * BUCKET (`bucket = id div 1000`, the table's natural contiguous
  * grouping), each carrying its bucket value as a
  * [[HasPartitionKey]] key, with [[SupportsReportPartitioning]]
  * advertising `KeyGroupedPartitioning(identity(bucket))`. Two such
  * scans joined on `bucket` (with
  * `spark.sql.sources.v2.bucketing.enabled`) plan a STORAGE-
  * PARTITIONED JOIN — zero shuffle on either side — the read-side
  * twin of the bucketed-table work graded at `io_bucketed_join`, and
  * the contract every lakehouse connector (Iceberg-style) implements
  * for 100 TB co-located joins: partition count tracks the layout's
  * bucket count, and Spark aligns the two sides by partition VALUE.
  *
  * Runtime narrowing is disabled in this mode (a late In-filter would
  * change the partition-value set after the partitioning has been
  * reported and matched); limits and aggregate pushdown fall back to
  * the sliced scan, which handles them better anyway.
  */
private[sources] class SynthLogBucketedScan(lo0: Long, hi0: Long,
    required0: StructType, pushed0: Array[Filter])
    extends SynthLogScan(lo0, hi0, slices = 1, required0, pushed0, None)
    with SupportsReportPartitioning {

  private val W = 1000L
  private def buckets: Seq[Long] =
    if (hi0 <= lo0) Seq.empty else (lo0 / W) to ((hi0 - 1) / W)

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("bucket")), buckets.size)

  // keep the reported partition-value set stable
  override def filterAttributes(): Array[NamedReference] = Array.empty
  override def filter(predicates: Array[Predicate]): Unit = ()

  override def planInputPartitions(): Array[InputPartition] =
    buckets.map { b =>
      SynthLogBucketKeyPartition(b,
        math.max(lo0, b * W), math.min(hi0, (b + 1) * W))
    }.toArray

  override def description(): String =
    s"synthlog-bucketed buckets=${buckets.size} ${super.description()}"
}

/** One bucket's id sub-range, keyed by its bucket value for
  * storage-partitioned join alignment.
  */
private[sources] case class SynthLogBucketKeyPartition(bucket: Long,
    lo: Long, hi: Long) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** The aggregated form of a (narrowed) [[SynthLogScan]]. Ungrouped:
  * one partition, one row, every value computed on the DRIVER in O(1)
  * from the range bounds / id list — no row is ever generated; empty
  * input follows global-aggregate SQL semantics (count = 0, min/max
  * NULL). GROUP BY bucket: `bucket = id div 1000` partitions the
  * keyspace into contiguous runs, so per-bucket count/min/max are
  * interval overlaps — partitions split the BUCKET range and each
  * reader streams its buckets' rows in O(1) state (In-list inputs
  * group the explicit ids instead). Output rows are
  * (group columns ++ aggregate columns), the complete-pushdown
  * contract.
  */
private[sources] class SynthLogAggScan(base: SynthLogScan, funcs: Seq[String],
    byBucket: Boolean) extends Scan with Batch with SupportsReportStatistics {

  private val W = 1000L // the bucket width of SynthLogSource.bucket

  override def readSchema(): StructType = {
    val aggFields = funcs.zipWithIndex.map { case (f, i) =>
      // per-group min/max are never null: a group exists only if non-empty
      StructField(s"${f}_$i", LongType, nullable = f != "count" && !byBucket)
    }
    val groupFields =
      if (byBucket) Seq(StructField("bucket", LongType, nullable = false))
      else Seq.empty
    StructType(groupFields ++ aggFields)
  }
  override def toBatch: Batch = this
  override def description(): String = {
    val g = if (byBucket) " group=bucket" else ""
    s"synthlog-agg [${funcs.mkString(",")}]$g of ${base.description()}"
  }

  private def nGroups: Long =
    if (!byBucket) 1L
    else base.idList match {
      case Some(a) => a.map(_ / W).distinct.length.toLong
      case None =>
        if (base.rowCount == 0L) 0L
        else base.maxId.get / W - base.minId.get / W + 1L
    }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(math.max(nGroups, 1L) * 8L * (funcs.size + 1))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(nGroups)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (!byBucket) {
      val values: Array[Any] = funcs.map {
        case "count" => base.rowCount
        case "min" => base.minId.map(Long.box).orNull
        case "max" => base.maxId.map(Long.box).orNull
      }.toArray
      return Array(SynthLogRowsPartition(Array(values)))
    }
    base.idList match {
      case Some(a) =>
        // explicit id list: group in the driver (the list is small by
        // construction — it arrived through an In filter)
        val rows = a.groupBy(_ / W).toArray.sortBy(_._1).map {
          case (b, ids) =>
            (Seq[Any](b) ++ funcs.map[Any] {
              case "count" => ids.length.toLong
              case "min" => ids.head
              case "max" => ids.last
            }).toArray
        }
        Array(SynthLogRowsPartition(rows))
      case None =>
        if (base.rowCount == 0L) return Array.empty
        val (lo, hi) = (base.minId.get, base.maxId.get + 1L)
        val bLo = lo / W
        val nB = (hi - 1L) / W - bLo + 1L
        val k = math.min(base.sliceCount.toLong, nB).toInt
        Array.tabulate(k) { i =>
          SynthLogBucketAggPartition(
            bLo + i * nB / k, bLo + (i + 1) * nB / k, lo, hi, funcs)
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthLogAggReaderFactory
}

private[sources] case class SynthLogRowsPartition(rows: Array[Array[Any]])
    extends InputPartition

/** Buckets `[bLo, bHi)` of the id interval `[lo, hi)` — each bucket's
  * stats are an interval overlap, computed as the reader advances.
  */
private[sources] case class SynthLogBucketAggPartition(bLo: Long, bHi: Long,
    lo: Long, hi: Long, funcs: Seq[String]) extends InputPartition

private[sources] class SynthLogAggReaderFactory extends PartitionReaderFactory {
  private def toRow(vs: Array[Any]): InternalRow =
    InternalRow.fromSeq(vs.toSeq.map {
      case null => null
      case l: java.lang.Long => l.longValue
      case l: Long => l
    })

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case SynthLogRowsPartition(rows) =>
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < rows.length }
          override def get(): InternalRow = toRow(rows(i))
          override def close(): Unit = {}
        }
      case SynthLogBucketAggPartition(bLo, bHi, lo, hi, funcs) =>
        new PartitionReader[InternalRow] {
          private var b = bLo - 1
          override def next(): Boolean = { b += 1; b < bHi }
          override def get(): InternalRow = {
            val blo = math.max(lo, b * 1000L)
            val bhi = math.min(hi, (b + 1) * 1000L)
            toRow((Seq[Any](b) ++ funcs.map[Any] {
              case "count" => bhi - blo
              case "min" => blo
              case "max" => bhi - 1L
            }).toArray)
          }
          override def close(): Unit = {}
        }
    }
}

/** `ids = None`: generate the half-open range `[lo, hi)`.
  * `ids = Some(a)`: generate exactly the ids in `a` (an intersected,
  * sorted, limit-truncated `In` list) — `lo`/`hi` are unused then.
  */
private[sources] class SynthLogScan(lo: Long, hi: Long, slices: Int,
    required: StructType, pushed: Array[Filter], ids: Option[Array[Long]],
    descending: Boolean = false)
    extends Scan with Batch with SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private val n: Long = ids.fold(math.max(hi - lo, 0L))(_.length.toLong)

  // Runtime (DPP-style) narrowing: Spark collects the broadcast side of
  // a join on `id`, translates it to an IN predicate, and calls
  // filter() BEFORE partition planning — the scan then emits only the
  // ids the join can match, the connector half of dynamic partition
  // pruning. Null until the runtime filter arrives; statistics are
  // pre-runtime by design.
  @volatile private var runtimeIds: Option[Array[Long]] = None

  // Only advertise `id` as runtime-filterable when it survives column
  // pruning: Spark resolves these refs against the scan's (pruned)
  // output and fails the whole query otherwise.
  override def filterAttributes(): Array[NamedReference] =
    // descending (complete-TopN) scans opt out: their row set is the
    // query's answer, not a superset to prune
    if (required.fieldNames.contains("id") && !descending)
      Array(Expressions.column("id"))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit =
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val onId = p.children().head match {
          case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
          case _ => false
        }
        if (onId) {
          val vals = p.children().drop(1).flatMap {
            case l: Literal[_] => l.value match {
              case v: java.lang.Long => Some(v.longValue)
              case v: java.lang.Integer => Some(v.longValue)
              case _ => None
            }
            case _ => None
          }.distinct.sorted
          runtimeIds =
            Some(runtimeIds.fold(vals)(prev => prev.intersect(vals)))
        }
      }
    }

  /** Closed-form stats over the generated keyspace — the basis of
    * aggregate pushdown ([[SynthLogAggScan]]).
    */
  private[sources] def rowCount: Long = n
  private[sources] def minId: Option[Long] =
    if (n == 0L) None else Some(ids.fold(lo)(_.head))
  private[sources] def maxId: Option[Long] =
    if (n == 0L) None else Some(ids.fold(hi - 1)(_.last))
  private[sources] def idList: Option[Array[Long]] = ids
  private[sources] def sliceCount: Int = slices

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val range = ids.fold(s"[$lo, $hi)")(a => s"ids(${a.length})")
    val ord = if (descending) " order=id-desc" else ""
    s"synthlog $range$ord cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}"
  }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(n * 8L * math.max(required.size, 1))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // static In list ∩ runtime In list; a runtime-only list still
    // respects the pushed range bounds
    val eff: Option[Array[Long]] = (ids, runtimeIds) match {
      case (Some(a), Some(r)) => Some(a.intersect(r))
      case (Some(a), None) => Some(a)
      case (None, Some(r)) => Some(r.filter(id => id >= lo && id < hi))
      case (None, None) => None
    }
    eff match {
      case Some(a) =>
        if (a.isEmpty) return Array.empty
        val k = math.min(slices.toLong, a.length.toLong).toInt
        Array.tabulate(k) { i =>
          SynthLogIdsPartition(
            a.slice((i * a.length / k), ((i + 1) * a.length / k)))
        }
      case None =>
        val m = math.max(hi - lo, 0L)
        if (m == 0L) return Array.empty
        val k = math.min(slices.toLong, m).toInt
        if (descending)
          // complete TopN contract: partition 0 carries the HIGHEST
          // chunk and each chunk is emitted high-to-low, so the
          // concatenation in partition order is globally descending
          Array.tabulate(k) { i =>
            SynthLogRevPartition(
              lo + (k - 1 - i) * m / k, lo + (k - i) * m / k)
          }
        else Array.tabulate(k) { i =>
          SynthLogPartition(lo + i * m / k, lo + (i + 1) * m / k)
        }
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthLogReaderFactory(required.fieldNames)
}

private[sources] case class SynthLogPartition(lo: Long, hi: Long)
    extends InputPartition

/** `[lo, hi)` emitted high-to-low — the complete-TopN DESC contract. */
private[sources] case class SynthLogRevPartition(lo: Long, hi: Long)
    extends InputPartition

private[sources] case class SynthLogIdsPartition(ids: Array[Long])
    extends InputPartition

private[sources] class SynthLogReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case SynthLogPartition(lo, hi) =>
        new SynthLogReader(() => new RangeIdIterator(lo, hi), cols)
      case SynthLogRevPartition(lo, hi) =>
        new SynthLogReader(() => new ReverseRangeIdIterator(lo, hi), cols)
      case SynthLogBucketKeyPartition(_, lo, hi) =>
        new SynthLogReader(() => new RangeIdIterator(lo, hi), cols)
      case SynthLogIdsPartition(ids) =>
        new SynthLogReader(() => ids.iterator, cols)
    }
}

private[sources] class RangeIdIterator(lo: Long, hi: Long)
    extends Iterator[Long] {
  private var id = lo
  override def hasNext: Boolean = id < hi
  override def next(): Long = { val v = id; id += 1; v }
}

private[sources] class ReverseRangeIdIterator(lo: Long, hi: Long)
    extends Iterator[Long] {
  private var id = hi
  override def hasNext: Boolean = id > lo
  override def next(): Long = { id -= 1; id }
}

/** Per-partition reader: an id cursor (contiguous counter or explicit
  * `In` list), computing ONLY the pruned columns per row. O(1) state
  * beyond the id source.
  */
private[sources] class SynthLogReader(mkIds: () => Iterator[Long],
    cols: Array[String]) extends PartitionReader[InternalRow] {
  import SynthLogSource._
  private val it = mkIds()
  private var id = 0L

  override def next(): Boolean = {
    if (!it.hasNext) return false
    id = it.next(); true
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toSeq.map {
      case "id" => id
      case "bucket" => bucket(id)
      case "level" => level(id)
      case "value" => value(id)
    })

  override def close(): Unit = {}
}
