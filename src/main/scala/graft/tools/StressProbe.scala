package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cc.{CliqueGen, ConnectedComponents, EdgeBuilder}

/** Larger-scale CC sanity: generator-shaped skewed graph, n blocks
  * (≈ n×500 nodes, n×600 cliques), distributed fixpoint, ground-truth
  * equality check. Usage: runMain graft.tools.StressProbe [nBlocks]
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id)").collect() // warm

    val cliques = CliqueGen.cliques(spark, n).localCheckpoint()
    val nCliques = cliques.count()
    val edges = EdgeBuilder.starEdges(cliques)
    val t0 = System.nanoTime()
    val res = ConnectedComponents.run(edges, maxIterations = 30)
    val dt = (System.nanoTime() - t0) / 1e9
    val assignments = res.assignments.cache()
    val nNodes = assignments.count()
    val nComps = assignments.select("component").distinct().count()
    val truth = CliqueGen.groundTruth(spark, n)
    val mismatches = assignments.toDF("node", "c1")
      .join(truth.toDF("node", "c2"), "node")
      .where("c1 <> c2").count()
    System.err.println(
      f"[stress] blocks=$n cliques=$nCliques nodes=$nNodes comps=$nComps " +
      f"converged=${res.converged} iters=${res.iterations} time=$dt%.1fs " +
      f"mismatches=$mismatches")
    assert(mismatches == 0 && nComps == n && res.converged)
    spark.stop()
  }
}
