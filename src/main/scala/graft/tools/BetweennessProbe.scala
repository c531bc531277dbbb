package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.GraphQueries

/** Measures the claim in GraphQueries.betweenness's scaladoc: source
  * count is the direct cost/accuracy knob of sampled Brandes. Expected
  * shape: WALL TIME LINEAR IN SEEDS — Brandes is O(m) work per source,
  * and sampling buys accuracy at exactly that price; the fixed
  * per-level overheads (edge-table scan, job scheduling) amortize, so
  * the per-seed marginal cost falls somewhat as seeds grow. Measured at
  * sf0.1 (local[32], second run): 8 → 7.3s, 32 → 21s, 128 → 75-89s,
  * i.e. ~0.91/0.66/0.6-0.7 s/seed. The frontier broadcast is
  * size-guarded (Hints.maybeBroadcast with the seeds·|V| bound), so
  * past ~4M frontier rows the level joins degrade to AQE-planned
  * shuffles instead of a giant broadcast.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.BetweennessProbe 8 32 128"
  * Prints per-seed-count wall seconds (second run of each, memoized
  * edges prewarmed) to stderr.
  */
object BetweennessProbe {
  def main(args: Array[String]): Unit = {
    val seedCounts = if (args.nonEmpty) args.map(_.toInt).toSeq
                     else Seq(8, 32, 128)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(n: Int): Double = {
      val t0 = System.nanoTime()
      GraphQueries.betweennessFrom(spark, sfDir, n).collect()
      (System.nanoTime() - t0) / 1e9
    }

    seedCounts.foreach(run) // warm: memoized edges + JIT
    seedCounts.foreach { n =>
      System.err.println(f"[probe] betweenness seeds=$n%4d ${run(n)}%.2fs")
    }
    spark.stop()
  }
}
