package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Probe: does the file source honor maxFilesPerTrigger under
  * Trigger.AvailableNow, and in which order are the staged files
  * admitted? Prints per-batch numInputRows for the late-data staging.
  */
object LateDataProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("late-data-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = graft.queries.Tables.events(spark, sfDir)
    val maxUs = raw.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val splitUs = maxUs - 2L * 3600 * 1000000L
    def newer = unix_micros(col("ts")) >= splitUs
    def older = unix_micros(col("ts")) < splitUs
    println(s"rows total=${raw.count()} " +
      s"new=${raw.where(newer).count()} " +
      s"old=${raw.where(older).count()}")
    val dir = java.nio.file.Files.createTempDirectory("late_probe")
    val stage = dir.resolve("in")
    def writeHalf(pred: org.apache.spark.sql.Column, name: String,
                  mtimeMs: Long): Unit = {
      val tmp = dir.resolve(s"tmp_$name")
      raw.where(pred).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp)
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.createDirectories(stage)
      val dst = stage.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    val now = System.currentTimeMillis()
    writeHalf(newer, "newest_first", now - 120000L)
    writeHalf(lit(false), "spacer_empty", now - 60000L)
    writeHalf(older, "older_late", now)
    val q = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("late_probe")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark)} " +
        s"stateRows=${so.map(_.numRowsTotal)}")
    }
    println(s"emitted=${spark.table("late_probe").count()}")
    spark.stop()
  }
}
