package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions.
  *
  * AQE's skew-join handling (on by default) splits oversized sort-merge
  * partitions after the fact and covers most cases; explicit salting
  * remains the tool when a single hot key must be spread BEFORE the
  * shuffle — e.g. the build side of a shuffled hash join, or a hot-key
  * aggregation feeding a join. The salt routes each big-side row to one
  * of `factor` sub-partitions of its key; the small side is replicated
  * across all `factor` salts, so the join result is exactly the plain
  * equi-join (each big row still meets every matching small row exactly
  * once). Cost: small side shuffles `factor`×.
  */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`,
    * spreading every big-side key over `factor` reducer sub-keys.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    // Salt must be DETERMINISTIC per row content: a counter-based salt
    // changes on task retry after a shuffle-fetch failure, which can
    // duplicate/drop rows when some reducers already committed (the
    // SPARK-23207 round-robin class of bug). Hashing all columns routes
    // identical rows identically — fully-duplicate hot rows then share
    // a salt, which caps the spread for that degenerate case but never
    // affects correctness.
    val b = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(factor.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
