package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values distinct-count sketch as a typed `Aggregator` —
  * bounded state (≤ k longs), map-side partial aggregation, one value
  * out. The sketch estimate depends only on the SET of hashed inputs
  * (inserts are dedup'd, merges are set-unions capped at the k
  * smallest), so the result is deterministic under any partitioning,
  * input order, or retry — which is what lets a sketch be
  * oracle-verified exactly: DuckDB computing "k-th smallest distinct
  * hash" with a window reaches the identical integer.
  *
  * Estimator: with S the k smallest distinct hash values drawn from a
  * space of size M, the k-th smallest h₍ₖ₎ estimates distinct-count as
  * `(k-1) * M / h₍ₖ₎` (Bar-Yossef et al. 2002, the classic KMV bound —
  * relative error ~ 1/√k). Below k distinct values the sketch IS the
  * set, so the exact count is returned. All arithmetic is integer:
  * hashes live in [0, 2^56) (14 hex chars of md5), so
  * `(k-1) * 2^56` with k = 128 stays under 2^63 — no overflow, no
  * floats, bit-equal across engines.
  *
  * At 100 TB this is the shape approximate distinct-count must take:
  * constant memory per group, partial-aggregated before the shuffle
  * (the exact `count(distinct)` alternative shuffles every distinct
  * value). Spark's own `approx_count_distinct` (HLL++) has the same
  * plan shape but a binary, engine-private sketch — graded separately
  * via a tolerance gate (sketch_hll_gate).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Long] {
  require(k >= 2 && k <= 4096, s"k out of range: $k")

  /** Hash space: [0, 2^56) — 14 hex chars of md5. */
  val MaxH: Long = 1L << 56

  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, h)
    if (i >= 0) b // already present
    else {
      val ins = -i - 1
      if (b.length < k) {
        val out = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        // displaces the current maximum; stays sorted, stays size k
        val out = new Array[Long](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-merge union of two sorted distinct arrays, capped at k
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); if (j < b.length && b(j) == v) j += 1; i += 1; v
        } else { val v = b(j); j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Long =
    if (b.length < k) b.length.toLong
    else ((k - 1).toLong * MaxH) / b(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
