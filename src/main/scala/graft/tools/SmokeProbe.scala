package graft.tools

import org.apache.spark.sql.SparkSession

/** Replicates the driver's t1 smoke: SparkEntry.entry rows > 0. */
object SmokeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.entry(spark).count()
    System.err.println(f"[smoke] entry rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    assert(n > 0)
    spark.stop()
  }
}
