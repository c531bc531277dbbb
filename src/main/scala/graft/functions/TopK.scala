package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Grouped top-k as a typed `Aggregator` with a BOUNDED buffer — the
  * scalable form of "top n per key".
  *
  * The window-function spelling (`row_number() over (partition by key
  * order by score) <= k`) must shuffle EVERY row of the fact table to
  * its key's partition before it can rank. This aggregator keeps at
  * most k (score, id) pairs per group in the map-side partial
  * aggregate, so the shuffle carries ≤ k rows per (group × map
  * partition) — at 100 TB with k = 3 that is the difference between
  * shuffling the table and shuffling kilobytes. Correctness is the
  * standard mergeable-summary argument: per-key top-k is
  * union-combinable (top-k of a union = top-k of concatenated
  * top-k's), and the (score desc, id asc) total order on distinct ids
  * makes the result — and therefore the gate hash — deterministic
  * under any partitioning, input order, or speculative retry.
  *
  * The buffer is kept sorted; reduce is an insertion into a ≤k array,
  * merge is a sorted merge truncated at k — both O(k).
  */
class TopK(k: Int) extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1 && k <= 1024, s"k out of range: $k")

  /** (score desc, id asc) — earlier in the seq = better. */
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] = {
    if (b.length == k && !beats(x, b.last)) b
    else {
      val (better, worse) = b.span(beats(_, x))
      (better ++ (x +: worse)).take(k)
    }
  }

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var i = 0; var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && beats(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
    }
    out.toSeq
  }

  override def finish(b: Seq[(Long, Long)]): Seq[(Long, Long)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
