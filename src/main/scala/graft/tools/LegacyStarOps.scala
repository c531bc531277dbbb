package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Frozen copy of the round-10 star rounds (collect_set adjacency), kept
  * ONLY so [[CCScaleProbe]]'s `giant` mode can A/B the old aggregation
  * shape against the O(1)-state min-join shape that replaced it in
  * [[graft.cc.StarOps]] (round-11 verdict task 1). Not part of the
  * library surface; see SCALE.md "giant component" for the measurements
  * this backs.
  *
  * The defect this preserves for measurement: `collect_set("nbr")` holds
  * a node's ENTIRE adjacency in one aggregation buffer. Once a component
  * converges, every edge is `(node, min)`; symmetrized and grouped by
  * `self`, the min node's buffer holds the whole component — O(component)
  * bytes in one task, untunable by partitioning.
  */
object LegacyStarOps {

  final case class LegacyStarResult(pairs: DataFrame, changeCount: Long,
                                    handle: DataFrame)

  def smallStar(nodePairs: DataFrame): LegacyStarResult = {
    val oriented = nodePairs.select(
      greatest(col("src"), col("dst")).as("self"),
      least(col("src"), col("dst")).as("nbr"))
    val grouped = oriented.groupBy("self").agg(collect_set("nbr").as("nbrs"))
    val m = least(col("self"), array_min(col("nbrs")))
    val srcs = concat(
      array(col("self")),
      filter(col("nbrs"), (n: Column) => n =!= m && n =!= col("self")))
    finish(grouped, srcs, m)
  }

  def largeStar(nodePairs: DataFrame): LegacyStarResult = {
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
    finish(grouped, srcs, m)
  }

  private def finish(grouped: DataFrame, srcs: Column, m: Column): LegacyStarResult = {
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
    LegacyStarResult(pairs, changeCount, computed)
  }

  /** The round-10 fixpoint loop over the legacy stars — same convergence
    * rule as [[graft.cc.ConnectedComponents.run]] (both change counts
    * stable, or both zero), eager counts per star.
    */
  def runLegacy(edges: DataFrame, maxIterations: Int = 20): DataFrame = {
    var pairs = edges.select(
      col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst"))
    val sentinel = 9999999L
    var prevLarge = sentinel
    var prevSmall = sentinel
    var converged = false
    var iter = 0
    var pendingUnpersist: Seq[DataFrame] = Nil
    // Same checkpoint hygiene as the production loop (serialized level,
    // superseded rounds freed deterministically) so the giant-probe A/B
    // isolates the AGGREGATION-STATE difference, not disk accumulation.
    var materializedCp: Option[org.apache.spark.rdd.RDD[_]] = None
    var pendingCp: Option[org.apache.spark.rdd.RDD[_]] = None
    def cpRdd(ds: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      ds.queryExecution.analyzed match {
        case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
        case _ => None
      }
    while (!converged && iter < maxIterations) {
      val t0 = System.nanoTime()
      val ls = largeStar(pairs)
      val ss = smallStar(ls.pairs)
      pendingUnpersist.foreach(_.unpersist(false))
      val next = ss.pairs.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
      materializedCp.foreach(_.unpersist(false))
      materializedCp = pendingCp
      pendingCp = cpRdd(next)
      pendingUnpersist = Seq(ls.handle, ss.handle)
      iter += 1
      System.err.println(f"[legacy-cc] iter=$iter large=${ls.changeCount} " +
        f"small=${ss.changeCount} ${(System.nanoTime() - t0) / 1e9}%.2fs")
      converged =
        (ls.changeCount == prevLarge && ss.changeCount == prevSmall) ||
        (ls.changeCount == 0 && ss.changeCount == 0)
      prevLarge = ls.changeCount
      prevSmall = ss.changeCount
      pairs = next
    }
    require(converged, s"legacy fixpoint did not converge in $maxIterations")
    val out = pairs.toDF("node", "component")
    out.count()
    pendingUnpersist.foreach(_.unpersist(false))
    materializedCp.foreach(_.unpersist(false))
    out
  }
}
