package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** RegistrySpec-style guard (VERDICT r6 item 7): every
  * `transformWithState` query's final batch aggregation must be
  * batching-invariant BY CONSTRUCTION. Per-row state emissions arrive
  * once per input row (Append mode), and which rows share a micro-batch
  * is an accident of replay — so the reduction over emissions must not
  * depend on batching, or the DuckDB gate goes green/red depending on
  * file staging. Two constructions qualify:
  *
  *   - `max_by(_, n_seen)`: take each entity's LAST snapshot (highest
  *     per-entity row counter) — invariant because n_seen is
  *     total-ordered per entity regardless of batching;
  *   - documented exemptions where every aggregated emission is final
  *     by itself: stream_running_count reduces monotone per-entity
  *     running maxima with max() (max over prefixes = final value);
  *     stream_session_timers aggregates CLOSED-session records, each
  *     emitted exactly once by its expiring timer.
  *
  * A new transformWithState query must either carry `max_by(_, n_seen)`
  * in its final aggregation or be exempted here with the same kind of
  * justification.
  */
class TransformWithStateGuardSpec extends AnyFunSuite {

  private val exempt = Map(
    "runningCount" -> "monotone per-entity running max reduced with max()",
    "sessionTimers" -> "aggregates once-emitted closed-session records")

  test("every transformWithState query reduces emissions batching-invariantly") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/main/scala/graft/streaming/StreamingQueries.scala")), "UTF-8")
    // Strip comment/scaladoc lines so prose mentioning max_by in the
    // NEXT def's doc can't mask a missing reduction in this one.
    val code = src.linesIterator
      .filterNot { l =>
        val t = l.trim
        t.startsWith("*") || t.startsWith("/*") || t.startsWith("//")
      }
      .mkString("\n")
    val blocks = code.split("\n  def ").toSeq.drop(1)
      .map(b => (b.takeWhile(c => c != '(' && c != '['), b))
    val users = blocks.filter(_._2.contains(".transformWithState("))
    assert(users.size >= 4,
      s"guard lost coverage: only ${users.map(_._1)} use transformWithState")
    val bad = users.collect {
      case (name, body) if !exempt.contains(name) && !body.contains("max_by(")
        => name
    }
    assert(bad.isEmpty,
      s"transformWithState defs without a batching-invariant max_by " +
        s"reduction (add max_by(_, n_seen) or a justified exemption): " +
        bad.mkString(", "))
    val stale = exempt.keySet -- users.map(_._1).toSet
    assert(stale.isEmpty,
      s"stale transformWithState exemptions (drop them): ${stale.mkString(", ")}")
  }
}
