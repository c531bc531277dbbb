package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cc.StarOps
import graft.queries.CCQueries

/** Perf probe: times each phase of the CC fixpoint loop separately.
  * Usage: runMain graft.tools.CCProbe [sfDir]
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    time("warmup (range sum)") {
      spark.range(2000000).selectExpr("sum(id)").collect()
    }
    time("lineitem 2-col scan") {
      graft.queries.Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_partkey").count()
    }
    time("cliques groupBy collect_set") {
      graft.queries.Tables.lineitem(spark, sfDir)
        .groupBy("l_orderkey")
        .agg(org.apache.spark.sql.functions.collect_set("l_partkey").as("nodes"))
        .count()
    }
    time("edges (no checkpoint) count") {
      CCQueries.copurchaseEdges(spark, sfDir).count()
    }
    var pairs = time("edges+checkpoint") {
      CCQueries.copurchaseEdges(spark, sfDir).localCheckpoint()
    }
    for (i <- 1 to 5) {
      val ls = time(s"iter$i largeStar") { StarOps.largeStar(pairs) }
      val ss = time(s"iter$i smallStar") { StarOps.smallStar(ls.pairs) }
      val next = time(s"iter$i checkpoint") { ss.pairs.localCheckpoint() }
      (ls.handles ++ ss.handles).foreach(_.unpersist(false))
      System.err.println(s"[probe] iter$i large=${ls.changeCount} small=${ss.changeCount} rows=${next.count()}")
      pairs = next
    }
    spark.stop()
  }
}
