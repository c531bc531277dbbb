package graft.queries

import org.apache.spark.sql.SparkSession

/** Per-(session, sfDir) memo for derived tables shared across queries —
  * the pattern [[CCQueries]]'s ccMemo and [[GraphQueries]]'s edgeMemo
  * established, factored out so new shared intermediates (the r5 verdict
  * asked for the incremental-CC base fixpoint and the triangle adjacency)
  * don't copy the boilerplate a fourth time.
  *
  * Bounded: a long-lived service cycling many (session, sf) pairs must
  * not pin checkpointed DataFrames forever; harness runs touch <= 3 sf
  * dirs, so the clear never fires there. Worst case under a race is a
  * recompute, never a wrong result.
  */
private[queries] final class Memo[V] {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()

  def apply(spark: SparkSession, sfDir: String)(
      build: (SparkSession, String) => V): V = {
    if (cache.size > 4) cache.clear()
    cache.computeIfAbsent((spark, sfDir), { case (s, d) => build(s, d) })
  }
}
