package graft.cc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components via the alternating Large-Star / Small-Star
  * fixpoint (Kiveris et al., SoCC 2014), Spark-SQL-native.
  *
  * Public contract mirrors the reference
  * (/root/reference/src/main/scala/com/kwartile/lib/cc/ConnectedComponent.scala:266-279):
  * the result maps every node of the graph to the minimum node id of its
  * component (the min node maps to itself), `converged` reports whether
  * the fixpoint was reached within `maxIterations`, and `iterations` is
  * the number of large+small rounds executed. Convergence rule
  * (reference :247-249), preserved exactly because it changes iteration
  * counts: converged ⇔ both change counts equal the previous iteration's
  * counts, OR both are zero.
  *
  * Unlike the reference (which returns a null RDD on non-convergence) we
  * always return the partial assignment; callers branch on `converged`.
  *
  * Scale discipline the reference lacks: each iteration's result is
  * `localCheckpoint`ed, truncating both RDD lineage and the Catalyst
  * logical plan (otherwise analysis time grows without bound around
  * iteration ~10). On a real cluster with a checkpoint dir configured,
  * set `reliableCheckpoint = true` to survive executor loss on very long
  * runs.
  */
object ConnectedComponents {

  final case class CCResult(assignments: DataFrame, converged: Boolean, iterations: Int)

  private val Sentinel = 9999999L // reference ConnectedComponent.scala:272

  /** @param edges DataFrame with integral columns `src`, `dst` (any
    *              orientation, duplicates/self-loops fine)
    */
  def run(edges: DataFrame, maxIterations: Int = 20,
          reliableCheckpoint: Boolean = false): CCResult = {
    val spark = edges.sparkSession
    var pairs = edges.select(
      col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst"))
    var prevLarge = Sentinel
    var prevSmall = Sentinel
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val t0 = System.nanoTime()
      val ls = StarOps.largeStar(pairs)
      val ss = StarOps.smallStar(ls.pairs)
      val next =
        if (reliableCheckpoint) ss.pairs.checkpoint()
        else ss.pairs.localCheckpoint()
      ls.handle.unpersist(false)
      ss.handle.unpersist(false)
      iter += 1
      if (sys.env.contains("GRAFT_CC_VERBOSE"))
        System.err.println(f"[cc] iter=$iter large=${ls.changeCount} " +
          f"small=${ss.changeCount} ${(System.nanoTime() - t0) / 1e9}%.2fs")
      converged =
        (ls.changeCount == prevLarge && ss.changeCount == prevSmall) ||
        (ls.changeCount == 0 && ss.changeCount == 0)
      prevLarge = ls.changeCount
      prevSmall = ss.changeCount
      pairs = next
    }
    CCResult(pairs.toDF("node", "component"), converged, iter)
  }

  /** Reference `run(cliques)` equivalent: cliques (array column) → CC. */
  def runCliques(cliques: DataFrame, nodesCol: String = "nodes",
                 maxIterations: Int = 20): CCResult =
    run(EdgeBuilder.cliqueEdges(cliques, nodesCol), maxIterations)

  /** Materialized components, reference CCDriver.scala:58-74 parity:
    * (component, size, sorted members).
    */
  def components(assignments: DataFrame): DataFrame =
    assignments.groupBy("component")
      .agg(sort_array(collect_list("node")).as("members"))
      .select(col("component"), size(col("members")).as("n_members"),
              col("members"))
}
