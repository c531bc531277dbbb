package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.cc.{CliqueGen, ConnectedComponents, EdgeBuilder}

/** Scale probe for the CC front door (VERDICT r3 #4): generates a
  * CliqueGen graph 10-100x the sf0.1 bench graph, runs BOTH
  * `runContracted` (the 100 TB path) and the plain alternating fixpoint
  * on the same edges, and validates labels against CliqueGen's ground
  * truth. With GRAFT_CC_VERBOSE set, runContracted also prints the
  * contraction ratio and the fixpoint prints per-round times.
  *
  * Usage: GRAFT_CC_VERBOSE=1 runMain graft.tools.CCScaleProbe [nBlocks] [mode]
  * (nBlocks=1000 ~ 4M edges, 5000 ~ 20M, 25000 ~ 100M;
  * mode = all | contracted | plain — split the biggest runs).
  */
object CCScaleProbe {
  def main(args: Array[String]): Unit = {
    val nBlocks = args.headOption.map(_.toInt).getOrElse(5000)
    val mode = args.drop(1).headOption.getOrElse("all")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    time("warmup") { spark.range(2000000).selectExpr("sum(id)").collect() }

    // Round-robin repartition: CliqueGen emits each block inside ONE
    // task, which would hand the partition-local contraction its best
    // case (every component task-local, one rep per node). Scattering
    // the edges mimics how a real corpus arrives — components smeared
    // across every task — which is the case the contraction must beat.
    val edges = time(s"generate nBlocks=$nBlocks (cliques -> edges, scattered, checkpointed)") {
      val e = EdgeBuilder.cliqueEdgesGen(CliqueGen.cliques(spark, nBlocks))
        .repartition(32)
        .localCheckpoint()
      e.count()
      e
    }
    val nEdges = edges.count()
    val nNodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst"))).distinct().count()
    System.err.println(s"[probe] graph: $nEdges edges (with duplicates), $nNodes nodes")

    // The 100 TB front door: partition-local contraction + inner solve.
    // smallGraphThreshold=0 forces the distributed fixpoint on the rep
    // graph so the probe measures the path a real cluster would take on
    // a graph whose rep set outgrows the driver.
    val truth = CliqueGen.groundTruth(spark, nBlocks).localCheckpoint()
    def mismatches(label: String, got: org.apache.spark.sql.DataFrame): Unit = {
      val bad = got.join(truth, "node")
        .where(got("component") =!= truth("component")).count()
      val missing = truth.join(got, Seq("node"), "left_anti").count()
      System.err.println(s"[probe] $label vs ground truth: wrong=$bad missing=$missing")
      require(bad == 0 && missing == 0, s"$label diverged from ground truth")
    }

    if (mode == "all" || mode == "contracted") {
      val contracted = time("runContracted (forced distributed inner)") {
        val r = ConnectedComponents.runContracted(edges, smallGraphThreshold = 0)
        r.assignments.localCheckpoint().count()
        r
      }
      System.err.println(s"[probe] contracted: converged=${contracted.converged} " +
        s"innerIterations=${contracted.iterations}")
      mismatches("contracted", contracted.assignments)
    }

    // The undecorated alternating fixpoint on the raw edges — the
    // reference's own algorithm at this scale (iteration parity check:
    // reference README claims <=6 at 10^11 nodes).
    if (mode == "all" || mode == "plain") {
      val plain = time("plain alternating fixpoint") {
        val r = ConnectedComponents.run(edges)
        r.assignments.localCheckpoint().count()
        r
      }
      System.err.println(s"[probe] plain: converged=${plain.converged} " +
        s"iterations=${plain.iterations}")
      mismatches("plain", plain.assignments)
    }
    System.err.println("[probe] PASS")
    spark.stop()
  }
}
