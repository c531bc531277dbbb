package graft.cc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-file driver parity with the reference CCDriver
  * (/root/reference/src/main/scala/com/kwartile/lib/cc/CCDriver.scala:40-79):
  * read one whitespace-separated clique per line, run CC, write one
  * component per line as `<size> <minNode> <sorted members…>`.
  *
  * Spark-native re-expression: the line parse is a codegen'd
  * `split`+cast projection (no Scala closure), the output formatting is
  * `concat_ws`/`array_join` over the materialized components, and the
  * skew the reference countered with a sampled `RangePartitioner`
  * (CCDriver.scala:62-67) is left to AQE.
  */
object CCTextDriver {

  /** S1+S2: text scan + line parse → cliques(nodes: array<bigint>).
    * Blank lines are dropped; tokens must be integral.
    */
  def readCliques(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("line"))
      .where(col("line") =!= "") // before the cast: ANSI cast('')->bigint throws
      .select(split(col("line"), "\\s+").cast("array<bigint>").as("nodes"))

  /** S3: component text lines, reference CCDriver.scala:74 format. */
  def formatComponents(assignments: DataFrame): DataFrame =
    ConnectedComponents.components(assignments)
      .select(concat_ws(" ",
        col("n_members"), col("component"),
        array_join(col("members"), " ")).as("value"))

  /** Full driver path: clique text file → CC → component text file.
    * The output is written ONLY on convergence (mirroring the reference
    * driver, which has no output to write when `run` returns null);
    * non-convergence is reported loudly on stderr and via the returned
    * result — callers must branch on `converged` before reading
    * `outPath`.
    */
  def run(spark: SparkSession, inPath: String, outPath: String,
          maxIterations: Int = 20): ConnectedComponents.CCResult = {
    val res = ConnectedComponents.runCliques(readCliques(spark, inPath),
      maxIterations = maxIterations)
    if (res.converged)
      formatComponents(res.assignments).write.mode("overwrite").text(outPath)
    else
      System.err.println(s"[cc-text-driver] did NOT converge in " +
        s"${res.iterations} iterations — no output written to $outPath")
    res
  }

  /** spark-submit entry point, reference CCDriver.scala:40-79 parity:
    * `graft.cc.CCTextDriver <cliqueFile> [outPath] [maxIterations]`.
    * Defaults mirror the reference exactly — output path is
    * `<cliqueFile>_cc_out` and maxIterations is 20 — with the two
    * hardcodes surfaced as optional args. Reuses an already-active
    * session when present (tests, spark-shell); otherwise builds a
    * local one the way the reference's embedded SparkConf does, but
    * sized to the host rather than the reference's `local[1]`.
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: graft.cc.CCTextDriver <cliqueFile> [outPath] [maxIterations]")
    val inPath = args(0)
    val outPath = if (args.length > 1) args(1) else inPath + "_cc_out"
    val maxIter = if (args.length > 2) args(2).toInt else 20
    val active = SparkSession.getActiveSession
    val spark = active.getOrElse(SparkSession.builder()
      .appName("ConnectedComponent")
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors())
      .getOrCreate())
    try {
      val res = run(spark, inPath, outPath, maxIter)
      if (res.converged)
        println(s"Converged in ${res.iterations} iterations")
      else
        println("Max iteration reached.  Could not converge")
    } finally if (active.isEmpty) spark.stop()
  }
}
