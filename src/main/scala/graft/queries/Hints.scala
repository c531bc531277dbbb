package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-guarded broadcast hints.
  *
  * A hard `broadcast()` on a table that is O(|V|) or O(m) in the data is
  * a 100×-scale landmine: the hint is unconditional, so when the graph
  * outgrows executor memory the degrade is a code edit — i.e. an OOM in
  * production first. [[maybeBroadcast]] makes the degrade data-driven:
  * the caller passes a row bound it already holds (or can read from an
  * already-checkpointed frame for the cost of a cached-block scan), and
  * past the cap the frame is returned unhinted, letting AQE pick the
  * join strategy from measured sizes.
  */
private[graft] object Hints {

  /** Default row cap for a guarded broadcast: 4M skinny rows is tens of
    * MB serialized — comfortably broadcastable on any realistic
    * executor, and the same order as the driver union-find escape hatch
    * in [[graft.cc.ConnectedComponents.runAuto]] (≤4M edges).
    */
  val MaxBroadcastRows: Long = 4000000L

  /** Broadcast `df` only when `approxRows` — a cheap UPPER BOUND on its
    * row count that the caller already knows (|V|, m, corpus size, a
    * count of an already-checkpointed parent) — is within `maxRows`.
    * Otherwise return `df` unhinted: AQE then plans the join from
    * runtime statistics (sort-merge or shuffled-hash), which is the
    * correct degrade at 100× — same plan shape, no OOM, no code edit.
    */
  def maybeBroadcast(df: DataFrame, approxRows: Long,
                     maxRows: Long = MaxBroadcastRows): DataFrame =
    if (approxRows <= maxRows) broadcast(df) else df
}
