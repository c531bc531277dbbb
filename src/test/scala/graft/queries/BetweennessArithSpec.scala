package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Pins the r14 optimization of the Brandes dependency contribution
  * (`GraphQueries.brandesContribExpr`): the int64 split-product form
  * must be VALUE-IDENTICAL to the decimal(38) form — and to BigInt
  * ground truth — on the guarded domain (sigma ≤ wsigma,
  * sigma ≤ ⌊√(2⁶³−1)⌋, wdppm ≥ 0). The identity being pinned:
  * with a = 10⁶ + wdppm = q·wsigma + r,
  *   (a·sigma) div wsigma = q·sigma + (r·sigma) div wsigma,
  * exact for non-negative int64 inputs because a·sigma expands to
  * q·sigma·wsigma + r·sigma and the floor passes through the first
  * (exact-multiple) term. r·sigma < wsigma·sigma ≤ maxSigma² keeps the
  * int64 path overflow-free under the caller's guard.
  */
class BetweennessArithSpec extends SparkSpec {

  private val MaxSafeSigma = 3037000499L // floor(sqrt(2^63 - 1))

  // (sigma, wdppm, wsigma) rows spanning the guarded domain's edges:
  // tiny values, sigma == wsigma (ratio 1), sigma = 1, huge wdppm near
  // int64, sigma at the guard boundary with wsigma at the boundary too
  // (worst-case r·sigma), and wdppm = 0 (first backward level).
  private val cases: Seq[(Long, Long, Long)] = Seq(
    (1L, 0L, 1L),
    (1L, 0L, 7L),
    (3L, 0L, 3L),
    (2L, 999999L, 5L),
    (7L, 123456789L, 11L),
    (1000003L, 88L, 2000003L),
    (999983L, Long.MaxValue - 1000000L, 999983L),
    (1L, Long.MaxValue - 1000000L, MaxSafeSigma),
    (MaxSafeSigma, 0L, MaxSafeSigma),
    (MaxSafeSigma - 1L, 5000000L, MaxSafeSigma),
    (123456789L, 1000000000000L, 987654321L * 2L),
    (2L, 3L, 1000000000L)
  )

  test("int64 split-product equals the decimal form and BigInt truth " +
       "on the guarded domain") {
    val s = spark; import s.implicits._
    val df = cases.toDF("sigma", "wdppm", "wsigma")
    val both = df.select(
      col("sigma"), col("wdppm"), col("wsigma"),
      GraphQueries.brandesContribExpr(intSafe = true).as("fast"),
      GraphQueries.brandesContribExpr(intSafe = false).as("slow"))
      .collect()
    both.foreach { r =>
      val (sigma, wdppm, wsigma) =
        (r.getLong(0), r.getLong(1), r.getLong(2))
      val truth =
        ((BigInt(sigma) * (BigInt(1000000) + BigInt(wdppm))) /
          BigInt(wsigma)).toLong
      assert(r.getLong(3) == truth,
        s"fast path wrong for (sigma=$sigma, wdppm=$wdppm, wsigma=$wsigma)")
      assert(r.getLong(4) == truth,
        s"decimal path wrong for (sigma=$sigma, wdppm=$wdppm, wsigma=$wsigma)")
    }
  }

  test("guard constant is the true int64 square-root floor") {
    assert(MaxSafeSigma * MaxSafeSigma > 0L, "square must not overflow")
    assert(BigInt(MaxSafeSigma + 1).pow(2) > BigInt(Long.MaxValue),
      "guard is not tight")
  }
}
