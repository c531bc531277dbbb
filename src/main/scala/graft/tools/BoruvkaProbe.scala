package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Scale probe for the Borůvka family (VERDICT r6 item 5): drives
  * [[graft.queries.GraphQueries.mstOn]] and
  * [[graft.queries.GraphQueries.affinityOn]] on a synthetic graph —
  * a path backbone (worst-case pointer depth) plus n pseudo-random
  * chords — at a given node count, reporting wall time, edge count,
  * and peak cached storage. Run at n and 10n to pin the "⌈log₂ n⌉
  * equi-join shuffles, no driver state" claim with measurements
  * (SCALE.md records the table).
  *
  *   sbt "runMain graft.tools.BoruvkaProbe 150000"
  *   sbt "runMain graft.tools.BoruvkaProbe 1500000"
  *
  * Node-id ceilings: mstOn packs ids into 2^21 (requires n < 2.09M),
  * affinityOn into 10^7 — both hold at the probe scales.
  */
object BoruvkaProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(150000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    time("warmup") { spark.range(2000000).selectExpr("sum(id)").collect() }

    @volatile var peakStorage = 0L
    val sampler = new Thread(() => {
      try while (true) {
        val s = spark.sparkContext.getRDDStorageInfo
          .map(i => i.memSize + i.diskSize).sum
        if (s > peakStorage) peakStorage = s
        Thread.sleep(250)
      } catch { case _: InterruptedException => () }
    })
    sampler.setDaemon(true)
    sampler.start()

    val nodes = spark.range(0, n).select(col("id").as("node"))
    val path = spark.range(0, n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    val chords = spark.range(0, n)
      .select(col("id").as("a"),
        ((col("id") * 2654435761L + 12345L) % n).as("b"))
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
    val pairs = time("generate (path + chords, scattered, checkpointed)") {
      val p = path.unionAll(chords).distinct().repartition(32).localCheckpoint()
      p.count(); p
    }
    val m = pairs.count()
    System.err.println(s"[probe] graph: $m edges, $n nodes")

    peakStorage = 0L
    val mstRow = time(s"mstOn n=$n m=$m") {
      GraphQueries.mstOn(pairs, nodes).collect()
    }
    System.err.println(s"[probe] mst result: ${mstRow.mkString("; ")}")
    System.err.println(f"[probe] mst peak cached storage: ${peakStorage / 1e9}%.2f GB")

    peakStorage = 0L
    val aff = time(s"affinityOn n=$n m=$m") {
      GraphQueries.affinityOn(pairs, nodes).collect()
    }
    System.err.println(s"[probe] affinity clusters (size -> count): " +
      aff.map(r => s"${r.getLong(0)}->${r.getLong(1)}").mkString(", "))
    System.err.println(f"[probe] affinity peak cached storage: ${peakStorage / 1e9}%.2f GB")

    spark.stop()
  }
}
