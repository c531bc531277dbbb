package graft.sources

/** Second-JVM committer for the cross-PROCESS AuditSink race spec
  * (VERDICT r13 #5). The in-process race spec pins the committer
  * contract between two driver THREADS; the fencing primitive itself
  * is filesystem-level O_EXCL (`Files.write(..., CREATE_NEW)` on the
  * lock and claim files), whose real adversary is a second JVM — a
  * zombie executor's driver or a concurrent job. This main is that
  * adversary: a separate process running a REAL `write().save()` into
  * the directory the spec's own session is committing to.
  *
  * Protocol (file-based, since the JVMs share only the filesystem —
  * exactly the coordination substrate the sink itself relies on):
  *   args = (dataDir, n, readyFile, goFile)
  *   1. start a local SparkSession, then touch `readyFile`;
  *   2. spin until `goFile` exists (the parent creates it when it
  *      launches its own save, so the two commits genuinely overlap);
  *   3. save; exit 0 on success, 3 on a LOUD contract loss (the
  *      concurrent-committer / commit-fenced / job-aborted messages),
  *      4 on any other failure (the spec fails the run on a 4).
  */
object AuditSinkRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, nStr, readyFile, goFile) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("auditsink-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try {
        import org.apache.spark.sql.functions._
        java.nio.file.Files.write(java.nio.file.Paths.get(readyFile),
          Array.empty[Byte])
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (!java.nio.file.Files.exists(java.nio.file.Paths.get(goFile))
               && System.nanoTime() < deadline) Thread.sleep(5)
        spark.range(0, nStr.toLong, 1, 2)
          .select(col("id").as("a"), (col("id") * 7L).as("b"))
          .write.format("graft.sources.AuditSink")
          .option("path", dir).mode("append").save()
        0
      } catch {
        case e: Throwable =>
          def msgs(t: Throwable): Seq[String] =
            if (t == null) Seq.empty
            else Option(t.getMessage).toSeq ++ msgs(t.getCause)
          e.printStackTrace()
          if (msgs(e).exists(m => m.contains("concurrent committer") ||
                m.contains("commit fenced") ||
                m.contains("Writing job aborted"))) 3
          else 4
      }
    spark.stop()
    System.exit(code)
  }
}
