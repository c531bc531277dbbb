package graft

/** Idempotence audit for every side-effecting graded query (the io_*,
  * stream_*, and src_* families — file writes, streaming replay, V2
  * sink commits). Each is invoked TWICE back-to-back in the same
  * session and must produce bit-identical output: shared-tmp-dir
  * state, checkpoint reuse, or commit-versioning drift can therefore
  * never again produce a one-environment gate flake (the round-7
  * src_auditsink_roundtrip lesson).
  */
class IdempotenceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def runOnce(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq

  private val families = Seq("io_", "stream_", "src_")

  test("every side-effecting graded query yields identical output when " +
       "run twice in one session") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => families.exists(n.startsWith))
    assert(names.size >= 40, s"audit lost coverage: only ${names.size}")
    val failures = names.flatMap { name =>
      try {
        val first = runOnce(name)
        val second = runOnce(name)
        if (first == second) None
        else {
          val diff = first.zipAll(second, "<missing>", "<missing>")
            .collectFirst { case (a, b) if a != b => s"$a != $b" }
            .getOrElse(s"sizes ${first.size} vs ${second.size}")
          Some(s"$name: $diff")
        }
      } catch {
        case e: Exception =>
          Some(s"$name threw: ${Option(e.getMessage).getOrElse(e.toString).take(200)}")
      }
    }
    assert(failures.isEmpty,
      s"non-idempotent side-effecting queries:\n${failures.mkString("\n")}")
  }
}
