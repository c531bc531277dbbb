package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures HOF-comprehension vs custom-Generator clique expansion on
  * the sf0.1 co-purchase cliques (same count() action on each).
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cliques = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(collect_set(col("l_partkey")).as("nodes"))
      .localCheckpoint()
    cliques.count()
    (1 to 3).foreach { round =>
      val t0 = System.nanoTime()
      val a = graft.cc.EdgeBuilder.cliqueEdges(cliques).count()
      val t1 = System.nanoTime()
      val b = graft.cc.EdgeBuilder.cliqueEdgesGen(cliques).count()
      val t2 = System.nanoTime()
      println(f"[gen] round $round hof=${(t1 - t0) / 1e9}%.3f s gen=${(t2 - t1) / 1e9}%.3f s rows=$a/$b")
    }
    spark.stop()
  }
}
