package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Throughput probe for the Spark 4 `transformWithState` RocksDB path —
  * pins the streaming family's scale claims with measured rows/sec
  * instead of design prose:
  *
  *   sbt "runMain graft.tools.StreamProbe 1000000 4"
  *
  * (rows, micro-batches). Synthetic (user_id, value_us) events staged
  * as `batches` parquet files replay through the ValueState processor
  * (`RunningUserStats` — the cheapest per-row state shape: one typed
  * get + put per row) and through the ListState processor
  * (`UserValueBuffer` — append + full re-sort per row, the worst-case
  * per-row cost the scaladocs warn about). Run at two volumes to see
  * whether throughput holds as state grows.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val users = math.max(rows / 100L, 1L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[probe] $label $s%.2fs (${rows / s / 1e3}%.0fk rows/s)")
      r
    }

    val stageDir = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_streamprobe", s"in_$rows")
    if (!Files.exists(stageDir.resolve("_SUCCESS_PROBE"))) {
      spark.range(0, rows, 1, batches)
        .select((col("id") % users).as("user_id"),
          ((col("id") * 2654435761L) % 1000003L).as("value_us"))
        .repartition(batches) // one part-file per micro-batch
        .write.mode("overwrite").parquet(stageDir.toString)
      Files.createFile(stageDir.resolve("_SUCCESS_PROBE"))
    }

    def run(label: String, mode: String,
        mkDs: SparkSession => org.apache.spark.sql.DataFrame): Unit = {
      val sub = spark.newSession()
      sub.conf.set("spark.sql.shuffle.partitions", "32")
      sub.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      time(label) {
        val q = mkDs(sub).writeStream.format("noop")
          .outputMode(mode)
          .trigger(Trigger.AvailableNow())
          .option("checkpointLocation", Files.createTempDirectory("sp_ck").toString)
          .start()
        q.awaitTermination()
      }
    }

    def input(sub: SparkSession) = sub.readStream
      .schema("user_id LONG, value_us LONG")
      .option("maxFilesPerTrigger", "1")
      .parquet(stageDir.toString)

    run("transformWithState ValueState (RunningUserStats)", "append", { sub =>
      import sub.implicits._
      input(sub).as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.RunningUserStats(),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "n_seen", "max_value_us")
    })

    run("transformWithState ListState (UserValueBuffer)", "append", { sub =>
      import sub.implicits._
      input(sub).as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.UserValueBuffer(),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("user_id", "n_seen", "median_us", "sum_us")
    })

    // baseline: the same replay through a stateless windowless count,
    // isolating state-store cost from source/replay overhead
    run("stateless baseline (groupBy count, update mode)", "update", { sub =>
      input(sub).groupBy("user_id").count()
        .select(col("user_id"), col("count"))
    })

    spark.stop()
  }
}
