package graft.tools

import org.apache.spark.sql.SparkSession

/** Perf probe for CC fixed costs on tiny graphs (embedding clusters). */
object TinyCCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    time("warmup") { spark.range(2000000).selectExpr("sum(id)").collect() }
    for (i <- 1 to 3)
      time(s"micro shuffle $i (groupBy on 1k rows)") {
        spark.range(1000).selectExpr("id % 10 AS k", "id AS v")
          .groupBy("k").sum("v").collect()
      }
    for (i <- 1 to 2)
      time(s"micro 2-shuffle chain $i") {
        val df = spark.range(1000).selectExpr("id % 10 AS k", "id AS v")
          .groupBy("k").sum("v")
          .selectExpr("k % 3 AS k2", "`sum(v)` AS v")
          .groupBy("k2").sum("v")
        df.collect()
      }
    time("full dedup_embedding_clusters") {
      graft.queries.DedupQueries.dedupEmbeddingClusters(spark, sfDir).count()
    }
    time("full dedup_minhash_clusters") {
      graft.queries.DedupQueries.dedupMinhashClusters(spark, sfDir).count()
    }
    spark.stop()
  }
}
