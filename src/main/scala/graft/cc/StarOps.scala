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
  *    summed over groups. Neighbor sets are deduped (HashSet in the
  *    reference, collect_set here), so set-minus (`array_except`) is
  *    exactly the reference's List `diff`.
  *
  * Each star triggers ONE action (the change-count sum) over a persisted
  * grouped projection; the emitted pairs are a narrow explode over that
  * same persisted data, so nothing is computed twice. The map-side
  * partial aggregation the reference hand-rolled with `aggregateByKey`
  * is automatic here (ObjectHashAggregate partial/final for collect_set).
  */
object StarOps {

  /** pairs: the new edge set; changeCount: connectivity changes this
    * round; handle: the persisted intermediate — unpersist it once
    * `pairs` has been consumed/checkpointed.
    */
  final case class StarResult(pairs: DataFrame, changeCount: Long, handle: DataFrame)

  private val EdgeArrayType = "array<struct<src:bigint,dst:bigint>>"

  def smallStar(nodePairs: DataFrame): StarResult = {
    val oriented = nodePairs.select(
      greatest(col("src"), col("dst")).as("self"),
      least(col("src"), col("dst")).as("nbr"))
    val grouped = oriented.groupBy("self").agg(collect_set("nbr").as("nbrs"))
    val m = least(col("self"), array_min(col("nbrs")))
    val newPairs = array_distinct(concat(
      array(struct(col("self").as("src"), m.as("dst"))),
      transform(
        filter(col("nbrs"), (n: Column) => n =!= m),
        (n: Column) => struct(n.as("src"), m.as("dst")))
    )).cast(EdgeArrayType)
    finish(grouped, newPairs)
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
    val newPairs = array_distinct(transform(
      filter(
        concat(array(col("self")), col("nbrs")),
        (n: Column) => n >= col("self")),
      (n: Column) => struct(n.as("src"), m.as("dst"))
    )).cast(EdgeArrayType)
    finish(grouped, newPairs)
  }

  /** Shared tail: attach pairs + per-group change count, persist, run the
    * single counting action, and expose the exploded pairs lazily.
    */
  private def finish(grouped: DataFrame, newPairs: Column): StarResult = {
    val oldPairs = transform(col("nbrs"),
      (n: Column) => struct(col("self").as("src"), n.as("dst"))
    ).cast(EdgeArrayType)
    val computed = grouped
      .select(newPairs.as("pairs"),
              size(array_except(newPairs, oldPairs)).cast("long").as("cnt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val changeCount =
      computed.agg(coalesce(sum("cnt"), lit(0L))).first().getLong(0)
    val pairs = computed
      .select(explode(col("pairs")).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    StarResult(pairs, changeCount, computed)
  }
}
