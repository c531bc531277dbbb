package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession, graftsql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, NullsFirst, NullsLast,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan — tier (c) of the build plan, the one
  * tier the engine previously exercised only as an optimizer `Rule`
  * ([[RangeBucketJoin]]): a logical node, a planner strategy, and a
  * physical operator, wired through `graftsql.ofRows`/`addStrategy`
  * (the runtime equivalent of `SparkSessionExtensions`
  * `injectPlannerStrategy`).
  *
  * The operator: exact top-k rows PER KEY under a sort order, as an
  * aggregate-shaped plan: a map-side pass keeps a bounded heap
  * (≤ k rows) per key per partition, the shuffle moves at most
  * `k · distinct-keys-per-partition` rows, and a reduce-side pass
  * merges heaps — the same partial/final split as a hash aggregate,
  * with NO SORT anywhere. The window idiom (`row_number().over(
  * partitionBy(key).orderBy(...)) <= k`) plans a per-partition SORT
  * plus `WindowGroupLimit` pruning instead.
  *
  * Measured domain of victory (tools.TopKProbe, 20M rows, k=3,
  * local[32]): HOT KEYS. At 10 distinct keys the heap plan wins
  * 2.6-4.2x (0.8-0.96s vs 2.1-3.4s) — the window's local sort pays
  * O(n log n) on every partition while the heap scans in O(n log k)
  * and ships 960 rows. At 100k keys the two tie; at 2M keys
  * (10 rows/key) the window WINS ~3x — the per-partition key map
  * approaches the partition size, the shuffle shrinks little, and a
  * codegen'd radix sort beats per-row JVM heap upkeep. Use this
  * operator for leaderboard/curation shapes (few groups, huge
  * corpus); keep the window for high-cardinality keys. Measured,
  * not guessed — both shapes are pinned in the probe.
  *
  * Memory: one ≤k-row heap per distinct key per task — the hash
  * aggregate's memory shape. Like partial aggregation it assumes the
  * per-task distinct-key set fits in memory; keys are hash-scattered,
  * so that holds whenever plain `groupBy(key)` does.
  */
final case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

/** `partial = true`: runs on whatever partitioning the child has and
  * bounds each task's output to k rows per locally-seen key.
  * `partial = false`: requires clustering on `keys` (Spark plans the
  * exchange), so each key's surviving candidates meet in one task and
  * the same bounded heap yields the exact global per-key top-k.
  */
final case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val n = k
    val childOutput = child.output
    // Loud memory bound: the per-task heap map holds ≤ k rows per
    // DISTINCT KEY seen by the task — the hash aggregate's memory
    // shape, but without its spill path. Outside the operator's
    // measured domain (few hot keys) the map can approach the
    // partition size; rather than dying with an opaque executor OOM,
    // fail fast with the remedy (the window idiom) once the key map
    // exceeds the configured bound. Default 8M keys ≈ k+1 rows × 8M
    // entries — around a GiB at typical graded row widths, far above
    // every sane use of this operator and far below an OOM.
    val maxKeys = conf.getConfString(
      TopKPerKey.MaxKeysConfKey, "8000000").toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // "top" = the first k rows of the requested SortOrder; keep the
      // k smallest under it. The queue is a max-heap (reversed
      // comparator): head = worst retained row, evicted when beaten.
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortOrder, childOutput)
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var pq = heaps.get(key)
        if (pq == null) {
          if (heaps.size() >= maxKeys) {
            throw new IllegalStateException(
              s"TopKPerKey: task saw more than $maxKeys distinct keys — " +
              "outside the operator's domain (few hot keys; see " +
              "tools.TopKProbe). Use the window idiom " +
              "(row_number over partitionBy(key)) for high-cardinality " +
              s"keys, or raise ${TopKPerKey.MaxKeysConfKey}.")
          }
          pq = new java.util.PriorityQueue[InternalRow](n + 1, rowOrd.reverse)
          heaps.put(key.copy(), pq)
        }
        if (pq.size < n) pq.add(row.copy())
        else if (rowOrd.compare(row, pq.peek()) < 0) {
          pq.poll(); pq.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }
}

object TopKPerKey {
  /** Per-task distinct-key bound for the heap map (session conf). */
  val MaxKeysConfKey = "spark.graft.topk.maxKeysPerTask"

  /** Resolve a Column against `df` through the ANALYZER (a throwaway
    * `select`), so the expression we store in the custom node is a
    * fully-resolved, serializable catalyst tree bound to `df`'s
    * attribute ids — `ExpressionUtils.expression` alone yields a lazy
    * `ColumnNodeExpression` wrapper that never analyzes inside a
    * custom node and is not task-serializable.
    */
  private def resolveExpr(df: DataFrame, c: Column): Expression =
    df.select(c).queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
      .projectList.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }

  /** Public API: exact per-key top-k of `df` under `orderCols`
    * (`col(...).desc`/`.asc` Columns; bare Columns sort ascending).
    * Registers the strategy on the session (idempotently) and builds
    * the DataFrame from the custom logical node.
    */
  def topK(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    graftsql.addStrategy(spark, TopKPerKeyStrategy)
    // Grouping/shuffle keys must be float-normalized (-0.0 → 0.0,
    // NaN → canonical NaN): the NormalizeFloatingNumbers rule does this
    // for Aggregate/Window/Join keys but never sees a custom node, and
    // both the per-task UnsafeProjection group map and the
    // ClusteredDistribution hash are bit-pattern-sensitive.
    val keys = keyCols.map(c => graftsql.normalizeFloats(resolveExpr(df, c)))
    val order = orderCols.map { c =>
      graftsql.sortSpec(c) match {
        case Some((child, desc, nullsLast)) =>
          SortOrder(resolveExpr(df, child),
            if (desc) Descending else Ascending,
            if (nullsLast) NullsLast else NullsFirst, Seq.empty)
        case None => SortOrder(resolveExpr(df, c), Ascending)
      }
    }
    graftsql.ofRows(spark,
      TopKPerKeyPlan(keys, order, k, df.queryExecution.analyzed))
  }
}
