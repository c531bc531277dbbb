package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The k SMALLEST long values per group, ascending, as a typed
  * `Aggregator` with a BOUNDED buffer — [[TopK]]'s single-column
  * sibling, built for [[graft.cc.ConnectedComponents.componentsPreview]]
  * (ADVICE r12): the window spelling (`row_number() over (partition by
  * component order by node) <= k`) lands an entire component's rows in
  * ONE task's sort, so a 10⁸-member mega-cluster pays an O(component)
  * per-task sort/spill even though the downstream state is bounded.
  * This aggregate keeps ≤ k values per group in the map-side partial,
  * so the mega-component's rows stream through every task at O(k)
  * state and the shuffle carries ≤ k values per (group × partition) —
  * no task anywhere holds work proportional to component size.
  *
  * Correctness is the mergeable-summary argument: bottom-k of a union
  * equals bottom-k of concatenated bottom-k's, and the ascending total
  * order on longs makes the result deterministic under any
  * partitioning, input order, or speculative retry.
  *
  * Buffer discipline: kept sorted ascending in an INDEXED seq (Vector
  * from `zero`/`reduce`, ArraySeq off the wire and from `merge`), so
  * the full-buffer reject really is one `length` + one `last` + one
  * comparison with zero allocation — a List buffer would silently turn
  * both accessors into O(k) walks per input row, the hot loop on a
  * 10⁸-member group.
  */
class BottomK(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k >= 1 && k <= 100000, s"k out of range: $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], x: Long): Seq[Long] =
    if (b.length == k && x >= b.last) b
    else {
      val (lo, hi) = b.span(_ <= x)
      (lo ++ (x +: hi)).take(k)
    }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && a(i) <= b(j))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[Long]): Seq[Long] = b

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
