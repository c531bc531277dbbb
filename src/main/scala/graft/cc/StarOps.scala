package graft.cc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One Large-Star / Small-Star round (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014), re-expressed on the
  * DataFrame API with codegen-friendly built-ins only — no UDFs, no RDDs.
  *
  * Semantics mirror the reference implementation exactly (reference:
  * /root/reference/src/main/scala/com/kwartile/lib/cc/ConnectedComponent.scala):
  *
  *  - smallStar (reference :42-107): orient every pair `(max, min)`,
  *    group by the max ("self"), let m = min(self :: nbrs); emit the
  *    distinct set {(self, m)} ∪ {(n, m) | n ∈ nbrs, n ≠ m}.
  *  - largeStar (reference :114-176): symmetrize (self-loops emitted
  *    once), group by self, m = min(self :: nbrs); emit the distinct set
  *    {(n, m) | n ∈ {self} ∪ nbrs, n ≥ self}.
  *  - changeCount (reference :91,160): |newPairs \ {(self, n) | n ∈ nbrs}|
  *    summed over groups.
  *
  * Implementation notes, load-bearing for scale:
  *
  *  - The emitted sets are distinct BY CONSTRUCTION (nbrs is a
  *    collect_set; the self pair is excluded from the neighbor scan), so
  *    no `array_distinct` is needed. Likewise every new pair shares
  *    dst = m, so the reference's set-diff change count collapses to
  *    `size(newPairs) - (m ∈ nbrs ? 1 : 0)` — the only old pair a new
  *    pair can equal is (self, m). This matters: array_distinct /
  *    array_except on struct arrays are O(n²) in Spark (no hash path for
  *    non-atomic types) and a converged giant component puts the whole
  *    component in one group's array — the quadratic fallback turned
  *    30ms iterations into 30s ones at a mere 20k nodes.
  *  - Each star runs ONE action (the change-count sum) over a persisted
  *    grouped projection; the emitted pairs are a narrow explode over
  *    the same persisted data, so nothing is computed twice. The
  *    map-side partial aggregation the reference hand-rolls with
  *    `aggregateByKey` is automatic (ObjectHashAggregate partial/final).
  */
object StarOps {

  /** pairs: the new edge set; changeCount: connectivity changes this
    * round; handle: the persisted intermediate — unpersist it once
    * `pairs` has been consumed/checkpointed.
    */
  final case class StarResult(pairs: DataFrame, changeCount: Long, handle: DataFrame)

  /** Large star without its own action or persist: the change count is
    * an [[org.apache.spark.sql.Observation]] collected DURING whatever
    * downstream job consumes `pairs` (in the CC loop: the small star's
    * count action). One job per fixpoint round instead of two, and the
    * large-star intermediate needs no cache — it streams straight into
    * the small star's shuffle. `changeCount()` must only be called
    * after a downstream action has executed `pairs` exactly once.
    */
  final case class LazyStarResult(pairs: DataFrame, changeCount: () => Long)

  def largeStarLazy(nodePairs: DataFrame): LazyStarResult = {
    val sym = nodePairs.select(explode(
      when(col("src") === col("dst"),
        array(struct(col("src").as("self"), col("dst").as("nbr"))))
      .otherwise(array(
        struct(col("src").as("self"), col("dst").as("nbr")),
        struct(col("dst").as("self"), col("src").as("nbr"))))
    ).as("e")).select(col("e.self").as("self"), col("e.nbr").as("nbr"))
    val grouped = sym.groupBy("self").agg(collect_set("nbr").as("nbrs"))
    val m = least(col("self"), array_min(col("nbrs")))
    val srcs = concat(
      array(col("self")),
      filter(col("nbrs"), (n: Column) => n > col("self")))
    val obs = new org.apache.spark.sql.Observation()
    val computed = grouped
      .select(
        srcs.as("srcs"),
        m.as("dst"),
        (size(srcs) - when(array_contains(col("nbrs"), m), 1).otherwise(0))
          .cast("long").as("cnt"))
      .observe(obs, coalesce(sum(col("cnt")), lit(0L)).as("change"))
    val pairs = computed.select(explode(col("srcs")).as("src"), col("dst"))
    // getOrElse: on an empty input Catalyst's PropagateEmptyRelation can
    // prune the CollectMetrics node entirely — no metric means 0 changes
    LazyStarResult(pairs,
      () => obs.get.getOrElse("change", 0L).asInstanceOf[Long])
  }

  def smallStar(nodePairs: DataFrame): StarResult = {
    val oriented = nodePairs.select(
      greatest(col("src"), col("dst")).as("self"),
      least(col("src"), col("dst")).as("nbr"))
    val grouped = oriented.groupBy("self").agg(collect_set("nbr").as("nbrs"))
    val m = least(col("self"), array_min(col("nbrs")))
    // {(self,m)} ∪ {(n,m) | n ∈ nbrs, n ≠ m, n ≠ self}: nbrs ≤ self by
    // orientation, so this is exactly the reference's post-dedup set.
    val srcs = concat(
      array(col("self")),
      filter(col("nbrs"), (n: Column) => n =!= m && n =!= col("self")))
    finish(grouped, srcs, m)
  }

  def largeStar(nodePairs: DataFrame): StarResult = {
    val sym = nodePairs.select(explode(
      when(col("src") === col("dst"),
        array(struct(col("src").as("self"), col("dst").as("nbr"))))
      .otherwise(array(
        struct(col("src").as("self"), col("dst").as("nbr")),
        struct(col("dst").as("self"), col("src").as("nbr"))))
    ).as("e")).select(col("e.self").as("self"), col("e.nbr").as("nbr"))
    val grouped = sym.groupBy("self").agg(collect_set("nbr").as("nbrs"))
    val m = least(col("self"), array_min(col("nbrs")))
    // {(n,m) | n ∈ {self} ∪ nbrs, n ≥ self}, distinct: self once, then
    // strictly-greater neighbors.
    val srcs = concat(
      array(col("self")),
      filter(col("nbrs"), (n: Column) => n > col("self")))
    finish(grouped, srcs, m)
  }

  /** Shared tail. New pairs per group: (s, m) for s ∈ srcs. Change count
    * per group: |new \ {(self, n) | n ∈ nbrs}|; since new pairs all have
    * dst = m and old pairs all have src = self, the only possible overlap
    * is (self, m) when m ∈ nbrs.
    */
  private def finish(grouped: DataFrame, srcs: Column, m: Column): StarResult = {
    val computed = grouped
      .select(
        srcs.as("srcs"),
        m.as("dst"),
        (size(srcs) - when(array_contains(col("nbrs"), m), 1).otherwise(0))
          .cast("long").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val changeCount =
      computed.agg(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
    val pairs = computed
      .select(explode(col("srcs")).as("src"), col("dst"))
    StarResult(pairs, changeCount, computed)
  }
}
