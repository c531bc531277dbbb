package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.SparkSpec

case class SessState(start: Long, last: Long, n: Long)
case class SessOut(user: Long, startMs: Long, lastMs: Long, n: Long)

object StatefulSession {
  val GapMs: Long = 30L * 60 * 1000

  def sessionize(
      user: Long,
      events: Iterator[(Long, Timestamp)],
      state: GroupState[SessState]): Iterator[SessOut] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(SessOut(user, s.start, s.last, s.n))
    } else {
      val sorted = events.map(_._2.getTime).toSeq.sorted
      var closed = List.empty[SessOut]
      var cur = state.getOption
      sorted.foreach { t =>
        cur match {
          case Some(s) if t - s.last >= GapMs => // gap exceeded: split
            closed ::= SessOut(user, s.start, s.last, s.n)
            cur = Some(SessState(t, t, 1))
          case Some(s) =>
            cur = Some(SessState(s.start, math.max(s.last, t), s.n + 1))
          case None =>
            cur = Some(SessState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + GapMs)
      }
      closed.reverseIterator
    }
  }
}

/** Custom streaming state via flatMapGroupsWithState: per-user
  * sessionization with a 30-minute gap, sessions closed either by a
  * later event beyond the gap (split inside the function) or by an
  * event-time timeout once the watermark passes last+gap. Batch
  * boundaries are controlled through a MemoryStream so every emission
  * is deterministic.
  */
class StatefulSessionSpec extends SparkSpec {

  test("flatMapGroupsWithState sessionization: gap splits and event-time timeouts") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = input.toDS()
      .withColumnRenamed("_1", "user").withColumnRenamed("_2", "ts")
      .withWatermark("ts", "10 minutes")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(StatefulSession.sessionize)
    val q = sessions.writeStream.format("memory").queryName("fmgws_test")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    def emitted() = spark.table("fmgws_test")
      .as[SessOut].collect().toSet

    // batch 1: user 1 session A (10:00, 10:10) — open, nothing emitted
    input.addData((1L, ts(10, 0)), (1L, ts(10, 10)))
    q.processAllAvailable()
    assert(emitted() === Set.empty)

    // batch 2: user 1 at 11:30 — 80min gap closes session A inline
    input.addData((1L, ts(11, 30)))
    q.processAllAvailable()
    assert(emitted() === Set(
      SessOut(1L, ts(10, 0).getTime, ts(10, 10).getTime, 2)))

    // batch 3: user 2 at 12:45 pushes the watermark to 12:35, past
    // session B's timeout (11:30 + 30min = 12:00) → B emits by timeout;
    // user 2's own session stays open
    input.addData((2L, ts(12, 45)))
    q.processAllAvailable()
    assert(emitted() === Set(
      SessOut(1L, ts(10, 0).getTime, ts(10, 10).getTime, 2),
      SessOut(1L, ts(11, 30).getTime, ts(11, 30).getTime, 1)))

    q.stop()
  }
}
