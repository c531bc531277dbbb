package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries for plan
  * review (pushdown / broadcast / codegen inspection).
  * Usage: runMain graft.tools.PlanProbe q6_forecast_revenue q2_revenue_by_nation ...
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
                else Seq("q6_forecast_revenue", "q2_revenue_by_nation")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
