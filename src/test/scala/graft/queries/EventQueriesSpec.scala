package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the batch event-analytics family at sf0.001
  * (cross-engine values are the DuckDB gate's job at sf0.01; these pin
  * the properties a refactor could silently break).
  */
class EventQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sessionize: per-user session events sum to the user's events, " +
       "spans are bounded by the user's own time range") {
    val ev = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_total"),
           (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
             .as("range_us"))
    val s = EventQueries.sessionize(spark, sfDir)
    val joined = s.join(ev, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_sessions") >= 1L)
      assert(r.getAs[Long]("max_session_events") <= r.getAs[Long]("n_total"))
      assert(r.getAs[Long]("max_session_span_us") <=
        r.getAs[Long]("total_session_span_us"))
      assert(r.getAs[Long]("total_session_span_us") <=
        r.getAs[Long]("range_us"))
    }
    // every user with events appears exactly once
    assert(s.count() === ev.count())
  }

  test("sessionize: a single-session user (no 30-min gaps) keeps one " +
       "session whose span is their full range") {
    // synthetic check through the same code path: the gap rule is what
    // the DuckDB oracle replays; here pin the boundary semantics on the
    // real data — each user's session count equals 1 + number of >30min
    // gaps in their ordered event sequence.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val gaps = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("gap",
        when(col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1L)
          .otherwise(0L))
      .groupBy("user_id").agg((sum(col("gap")) + 1L).as("expect_sessions"))
    val got = EventQueries.sessionize(spark, sfDir)
      .join(gaps, "user_id")
      .where(col("n_sessions") =!= col("expect_sessions"))
    assert(got.count() === 0L)
  }

  test("funnel: stage populations are monotone non-increasing and ppm " +
       "rates are consistent") {
    val r = EventQueries.funnel(spark, sfDir).head()
    val v = r.getAs[Long]("n_view")
    val c = r.getAs[Long]("n_click_after_view")
    val p = r.getAs[Long]("n_purchase_after_click")
    assert(v >= c && c >= p && p >= 0L)
    assert(r.getAs[Long]("conv1_ppm") === c * 1000000L / v)
    assert(r.getAs[Long]("conv2_ppm") === p * 1000000L / c)
  }

  test("islands: histogram mass equals the distinct (user, day) count " +
       "and lengths are span-bounded") {
    val days = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val span = days.agg(max(col("day")) - min(col("day"))).head.getLong(0) + 1
    val hist = EventQueries.islands(spark, sfDir).collect()
    assert(hist.nonEmpty)
    val mass = hist.map(r => r.getAs[Long]("len") * r.getAs[Long]("n_islands")).sum
    assert(mass === days.count(),
      "every active day belongs to exactly one island")
    hist.foreach { r =>
      assert(r.getAs[Long]("len") >= 1L && r.getAs[Long]("len") <= span)
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_islands"),
        "a user can own several islands of one length, never the reverse")
    }
  }

  test("ewma: matches a brute-force 20-day decayed sum on the daily series") {
    val daily = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * lit(1000000.0) + lit(0.5)).cast("long").as("v"))
      .groupBy("day").agg(sum(col("v")).as("v"))
      .collect().map(r => r.getAs[Long]("day") -> r.getAs[Long]("v")).toMap
    val got = EventQueries.ewma(spark, sfDir).collect()
    assert(got.length === daily.size, "one output row per observed day")
    got.foreach { r =>
      val d = r.getAs[Long]("day")
      val expect = (0 to 19).map { k =>
        daily.getOrElse(d - k, 0L) * (1L << (19 - k))
      }.sum
      assert(r.getAs[Long]("ewma_fp") === expect, s"day $d")
      assert(r.getAs[Long]("day_value_us") === daily(d))
    }
  }

  test("retention: offset-0 diagonal counts every user exactly once, " +
       "offsets are non-negative and calendar-bounded") {
    val rows = EventQueries.retention(spark, sfDir).collect()
    val nUsers = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val diag = rows.filter(_.getAs[Long]("offset_day") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(diag === nUsers, "every user must appear in their cohort's day 0")
    rows.foreach { r =>
      assert(r.getAs[Long]("offset_day") >= 0L)
      assert(r.getAs[Long]("offset_day") <= 31L, "events span ~30 days")
      assert(r.getAs[Long]("n_users") >= 1L)
    }
  }
}
