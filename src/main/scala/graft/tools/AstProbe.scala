package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the analyzed expression tree for interval arithmetic — used to
  * pin the AST shapes RangeBucketJoin must match on this Spark version.
  */
object AstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
      .select(col("a"), timestamp_micros(col("a")).as("ta"),
              timestamp_micros(col("b")).as("tb"))
    def dump(name: String, c: org.apache.spark.sql.Column): Unit = {
      val e = df.select(c.as("x")).queryExecution.analyzed
        .expressions.head
      println(s"== $name: ${e.getClass.getName}")
      e.foreach(n => println(s"  ${n.getClass.getName}  dt=${n.dataType}  :: ${n.sql}"))
    }
    dump("ts_plus_interval", col("ta") + expr("INTERVAL 60 SECONDS"))
    dump("ts_le", col("tb") <= col("ta") + expr("INTERVAL 60 SECONDS"))
    dump("long_plus", col("a") + lit(60000000L))
    spark.stop()
  }
}
