package graft.cc

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame

/** GraphX/Pregel connected components, kept as the independent
  * cross-check oracle exactly as the reference does
  * (/root/reference/src/main/scala/com/kwartile/lib/cc/CCGraphXDriver.scala:84-86).
  * Both paths label a component by its minimum node id, so outputs are
  * directly comparable. GraphX degrades past ~1e7 nodes / 1e8 edges
  * (reference README.md:4) — the Large/Small-Star path is the scale path.
  */
object GraphXCC {

  /** edges(src, dst) → DataFrame(node: bigint, component: bigint) */
  def run(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeRdd = edges
      .selectExpr("cast(src as bigint)", "cast(dst as bigint)")
      .as[(Long, Long)].rdd
      .map { case (s, d) => Edge(s, d, 1) }
    Graph.fromEdges(edgeRdd, 1)
      .connectedComponents()
      .vertices
      .toDF("node", "component")
  }
}
