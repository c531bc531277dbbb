package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.cc.{ConnectedComponents, EdgeBuilder}

class GraphQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Naive reference triangle enumeration on the same edge set, done
    * driver-side: adjacency sets + a<b<c membership test.
    */
  private def bruteTriangleCounts(): Map[Long, Long] = {
    val cliques = Tables.lineitem(spark, sfDir)
      .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("nodes"))
    val edges = EdgeBuilder.cliqueEdges(cliques)
      .where(col("src") =!= col("dst"))
      .select(col("dst").as("u"), col("src").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (u, v) <- edges
      w <- adj(u) if w > v && adj(v).contains(w) // u < v < w by construction
    } {
      counts(u) += 1; counts(v) += 1; counts(w) += 1
    }
    counts.toMap
  }

  test("triangleTop matches a driver-side brute-force enumeration") {
    val got = GraphQueries.triangleTop(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = bruteTriangleCounts()
    val want = brute.toSeq.sortBy { case (n, c) => (-c, n) }.take(20)
    assert(got.toSeq === want)
  }

  test("degreeHist masses sum to the distinct-part count") {
    val hist = GraphQueries.degreeHist(spark, sfDir)
      .agg(sum("n_nodes")).collect()(0).getLong(0)
    val parts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(hist === parts)
  }

  test("ccSizeHist masses sum to the sparse-graph node count") {
    val li = Tables.lineitem(spark, sfDir).where(col("l_quantity") >= 45)
    val nodes = li.select("l_partkey").distinct().count()
    val mass = GraphQueries.ccSizeHist(spark, sfDir)
      .agg(sum(col("comp_size") * col("n_components"))).collect()(0).getLong(0)
    assert(mass === nodes)
    // the sparse graph must actually fragment, or the query proves nothing
    assert(GraphQueries.ccSizeHist(spark, sfDir).count() > 1)
  }

  test("ccIncremental is bit-identical to a from-scratch solve") {
    val li = Tables.lineitem(spark, sfDir).where(col("l_quantity") >= 45)
    val cliques = li.groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("nodes"))
    val scratch = ConnectedComponents.runContracted(EdgeBuilder.starEdges(cliques))
      .assignments.orderBy("node")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val incr = GraphQueries.ccIncremental(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(incr === scratch)
    // the delta must both merge existing components and introduce new
    // nodes, or the test exercises only half the composition
    val baseNodes = li.where(col("l_orderkey") % 10 =!= 7)
      .select("l_partkey").distinct().count()
    assert(incr.size > baseNodes, "delta introduced no new nodes")
  }
}
