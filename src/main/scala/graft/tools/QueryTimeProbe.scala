package graft.tools

import org.apache.spark.sql.SparkSession

/** Times selected graded queries end-to-end (build + execute +
  * collect), N repetitions each after one warm-up, at the sf dir in
  * SPARK_GRAFT_SF_DIR — the harness for before/after measurements of a
  * single query without the full Bench surface.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.QueryTimeProbe q1 q2
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "pass query names")
    args.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      q(spark, sfDir).collect() // warm-up (IO cache, codegen)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = q(spark, sfDir).collect().length
        (System.nanoTime() - t0) / 1e9 -> rows
      }
      println(f"PROBE $n reps=$reps rows=${times.head._2} " +
        f"times=${times.map(t => f"${t._1}%.2f").mkString(",")} " +
        f"median=${times.map(_._1).sorted.apply(reps / 2)}%.2f")
    }
    spark.stop()
  }
}
