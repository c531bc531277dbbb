package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the custom per-key top-k operator against the window
  * idiom it replaces, on a synthetic corpus big enough for the
  * shuffle-volume difference to dominate:
  *
  *   sbt "runMain graft.tools.TopKProbe 20000000 100000 3"
  *
  * (rows, distinct keys, k). The window plan shuffles and sorts all
  * `rows`; the TopKPerKey plan shuffles at most k·keys·partitions
  * candidate rows. SCALE.md records the measured ratio.
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val keys = args.drop(1).headOption.map(_.toLong).getOrElse(100000L)
    val k = args.drop(2).headOption.map(_.toInt).getOrElse(3)
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

    val data = spark.range(0, rows, 1, 32).select(
      (col("id") % keys).as("key"),
      ((col("id") * 2654435761L) % 1000003L).as("score"),
      col("id").as("tid"))
      .localCheckpoint()
    data.count()

    for (rep <- 1 to 2) {
      val w = time(s"window row_number rep$rep (rows=$rows keys=$keys k=$k)") {
        data.withColumn("rn", row_number().over(
            Window.partitionBy("key").orderBy(col("score").desc, col("tid"))))
          .where(col("rn") <= k).agg(count(lit(1)), sum(col("score"))).collect()
      }
      val t = time(s"TopKPerKey rep$rep") {
        graft.plans.TopKPerKey.topK(data, Seq(col("key")),
            Seq(col("score").desc, col("tid").asc), k)
          .agg(count(lit(1)), sum(col("score"))).collect()
      }
      require(w.map(_.toSeq).toSeq == t.map(_.toSeq).toSeq,
        s"results diverge: ${w.mkString} vs ${t.mkString}")
      System.err.println(s"[probe] results identical: ${t.mkString(",")}")
    }
    spark.stop()
  }
}
