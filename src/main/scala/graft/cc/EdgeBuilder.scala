package graft.cc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clique → edge-list expansion.
  *
  * Re-expresses the reference's `buildPairs` (see
  * /root/reference/src/main/scala/com/kwartile/lib/cc/ConnectedComponent.scala:187-217)
  * as declarative Spark SQL higher-order functions so the expansion runs
  * inside codegen'd projections instead of a Scala closure:
  *
  *   - a clique `[n1..nk]` (k >= 2) yields all k·(k-1)/2 pairwise edges,
  *     each oriented `(max, min)`;
  *   - a singleton clique `[n]` yields the self-pair `(n, n)` so isolated
  *     vertices are reported as singleton components
  *     (reference ConnectedComponent.scala:193-197);
  *   - an empty array yields nothing (the reference would throw on
  *     `nodes.head`; we degrade gracefully).
  *
  * Scale note: all-pairs expansion is O(k²) per clique. For very large
  * cliques prefer [[starEdges]], which emits the O(k) star `(nᵢ, n₁)` —
  * connectivity-equivalent for CC purposes and far cheaper to shuffle.
  */
object EdgeBuilder {

  private val EdgeArrayType = "array<struct<src:bigint,dst:bigint>>"

  /** All-pairs expansion, reference-parity semantics. Input: a column of
    * `array<integral>`; output: DataFrame(src: bigint, dst: bigint).
    */
  def cliqueEdges(cliques: DataFrame, nodesCol: String = "nodes"): DataFrame = {
    val n = col(nodesCol).cast("array<bigint>")
    val allPairs = flatten(
      transform(n, (x: Column, i: Column) =>
        transform(slice(n, i + lit(2), greatest(size(n) - i - 1, lit(0))),
          (y: Column) =>
            struct(greatest(x, y).as("src"), least(x, y).as("dst")))))
    val pairs = when(size(n) === 1,
        array(struct(n.getItem(0).as("src"), n.getItem(0).as("dst"))))
      .otherwise(allPairs)
      .cast(EdgeArrayType)
    cliques
      .where(size(n) > 0)
      .select(explode(pairs).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** All-pairs expansion through the custom Catalyst Generator
    * ([[graft.functions.CliquePairs]]) — identical semantics to
    * [[cliqueEdges]] (property-pinned), but the pairs STREAM out of
    * the generator instead of being materialized as an array<struct>
    * first. Preferable when cliques can be large; kept alongside the
    * HOF form, which stays on the whole-stage-codegen path and wins on
    * small cliques.
    */
  def cliqueEdgesGen(cliques: DataFrame, nodesCol: String = "nodes"): DataFrame = {
    val n = col(nodesCol).cast("array<bigint>")
    cliques
      .where(size(n) > 0)
      .select(graft.functions.CliquePairs.of(n).as(Seq("src", "dst")))
  }

  /** Scale-path variant: connect every clique member to the clique's min
    * node (a star). Same connected components, O(k) edges per clique.
    */
  def starEdges(cliques: DataFrame, nodesCol: String = "nodes"): DataFrame = {
    // Distinct first: a clique like [5,5] must yield the (5,5)
    // self-pair (cliqueEdges parity), not vanish after the hub filter.
    val n = array_distinct(col(nodesCol).cast("array<bigint>"))
    val hub = array_min(n)
    val pairs = when(size(n) === 1,
        array(struct(n.getItem(0).as("src"), n.getItem(0).as("dst"))))
      .otherwise(transform(
        filter(n, (x: Column) => x =!= hub),
        (x: Column) => struct(x.as("src"), hub.as("dst"))))
      .cast(EdgeArrayType)
    cliques
      .where(size(n) > 0)
      .select(explode(pairs).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }
}
