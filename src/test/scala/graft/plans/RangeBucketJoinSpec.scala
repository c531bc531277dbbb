package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RangeBucketJoin rule: fires on constant-width bands, preserves exact
  * join semantics (including negative ticks, where `div` truncates
  * rather than floors — the 2-bucket probe argument must survive that),
  * and stays off shapes it can't bound.
  */
class RangeBucketJoinSpec extends SparkSpec {

  private def withRule[T](f: => T): T = {
    val before = spark.experimental.extraOptimizations
    if (!before.contains(RangeBucketJoin))
      spark.experimental.extraOptimizations = before :+ RangeBucketJoin
    try f
    finally spark.experimental.extraOptimizations = before
  }

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pure long-tick range join: exact vs brute force, incl. negatives") {
    import spark.implicits._
    // All ticks in [-25, 25] on both sides; window width 7 starting at
    // offsets that exercise lo != 0 too.
    val ticks = (-25L to 25L).toDF("t")
    val a = ticks.select(col("t").as("ta"))
    val b = ticks.select(col("t").as("tb"))
    val expected = for {
      x <- -25L to 25L; y <- -25L to 25L
      if y >= x + 3 && y <= x + 10
    } yield (x, y)
    withRule {
      val joined = a.join(b,
        col("tb") >= col("ta") + lit(3L) && col("tb") <= col("ta") + lit(10L))
      val plan = physical(joined)
      assert(plan.contains("__graft_rb"), s"rule did not fire:\n$plan")
      assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
        s"range join stayed quadratic:\n$plan")
      val got = joined.select("ta", "tb").as[(Long, Long)].collect().sorted
      assert(got.toSeq == expected.sorted)
    }
  }

  test("timestamp band with INTERVAL arithmetic: exact vs brute force") {
    import spark.implicits._
    // Event times 0..300s in 7s steps; pairs within [0s, 60s].
    val us = (0L to 300L by 7L).map(_ * 1000000L)
    val ev = us.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val expected = for {
      x <- us; y <- us
      if y >= x && y <= x + 60L * 1000000L
    } yield (x, y)
    withRule {
      val a = ev.select(col("ts").as("tsa"))
      val b = ev.select(col("ts").as("tsb"))
      val joined = a.join(b,
        col("tsb") >= col("tsa") &&
        col("tsb") <= col("tsa") + expr("INTERVAL 60 SECONDS"))
      assert(physical(joined).contains("__graft_rb"))
      val got = joined
        .select(unix_micros(col("tsa")), unix_micros(col("tsb")))
        .as[(Long, Long)].collect().sorted
      assert(got.toSeq == expected.sorted)
    }
  }

  test("equi key + band: bucket key joins the equi keys (q12/q25 shape)") {
    import spark.implicits._
    val ev = Seq((1L, 0L), (1L, 50L), (1L, 120L), (2L, 10L), (2L, 15L))
      .toDF("uid", "t")
    withRule {
      val a = ev.select(col("uid").as("ua"), col("t").as("ta"))
      val b = ev.select(col("uid").as("ub"), col("t").as("tb"))
      val joined = a.join(b,
        col("ua") === col("ub") &&
        col("tb") >= col("ta") && col("tb") <= col("ta") + lit(60L))
      val plan = physical(joined)
      assert(plan.contains("__graft_rb"), s"rule did not fire:\n$plan")
      val got = joined.select("ua", "ta", "tb")
        .as[(Long, Long, Long)].collect().sorted
      val expected = Seq((1L, 0L, 0L), (1L, 0L, 50L), (1L, 50L, 50L),
        (1L, 120L, 120L), (2L, 10L, 10L), (2L, 10L, 15L), (2L, 15L, 15L))
      assert(got.toSeq == expected)
    }
  }

  test("does not fire without a two-sided constant-width band") {
    import spark.implicits._
    val df = (0L to 20L).toDF("t")
    withRule {
      val a = df.select(col("t").as("ta"))
      val b = df.select(col("t").as("tb"))
      // upper bound only — unbounded window, no bucketing possible
      val oneSided = a.join(b, col("tb") <= col("ta") + lit(5L))
      assert(!physical(oneSided).contains("__graft_rb"))
      // bounds on DIFFERENT left bases — row-dependent width
      val c = df.select(col("t").as("tc"), (col("t") * 2).as("tc2"))
      val twoBase = c.join(b,
        col("tb") >= col("tc") && col("tb") <= col("tc2") + lit(5L))
      assert(!physical(twoBase).contains("__graft_rb"))
    }
  }

  test("seeded random bands: exact parity with brute force (30 cases)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    withRule {
      for (i <- 1 to 30) {
        val n = 1 + rnd.nextInt(40)
        val m = 1 + rnd.nextInt(40)
        val span = 1 + rnd.nextInt(200)
        val as = Seq.fill(n)(rnd.nextLong() % span)
        val bs = Seq.fill(m)(rnd.nextLong() % span)
        val lo = rnd.nextLong() % 20
        val w = 1 + rnd.nextInt(30)
        val hi = lo + w
        val expected = (for { x <- as; y <- bs if y >= x + lo && y <= x + hi }
          yield (x, y)).sorted
        val joined = as.toDF("ta").join(bs.toDF("tb"),
          col("tb") >= col("ta") + lit(lo) && col("tb") <= col("ta") + lit(hi))
        assert(physical(joined).contains("__graft_rb"), s"case $i: no fire")
        val got = joined.select("ta", "tb").as[(Long, Long)].collect().sorted
        assert(got.toSeq == expected, s"case $i: n=$n m=$m lo=$lo hi=$hi")
      }
    }
  }

  test("rule is a no-op when not registered (baseline sanity)") {
    import spark.implicits._
    val a = (0L to 5L).toDF("t").select(col("t").as("ta"))
    val b = (0L to 5L).toDF("t").select(col("t").as("tb"))
    val joined = a.join(b,
      col("tb") >= col("ta") && col("tb") <= col("ta") + lit(2L))
    assert(!physical(joined).contains("__graft_rb"))
  }
}
