package graft.queries

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** graph_mst against an INDEPENDENT algorithm: the distributed Borůvka
  * loop vs a driver-side Kruskal over the same weighted pairs. With
  * unique edge keys the minimum spanning forest is unique, so any two
  * correct algorithms must produce the identical edge set — checked
  * via the query's (n_edges, weight_sum, checksum, n_components) row
  * on a pencil graph, a pathological single-chain graph (worst case
  * for the per-round contraction), and the sf0.001 co-purchase data.
  */
class MstSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Kruskal over (u < v) pairs with the query's weight function and
    * (w, u, v) lexicographic tie-break — the same unique key order.
    */
  private def kruskal(pairs: Seq[(Long, Long)], nodes: Seq[Long])
      : (Long, Long, Long, Long) = {
    val par = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (par.getOrElse(r, r) != r) r = par(r)
      var c = x
      while (par.getOrElse(c, c) != c) { val n = par(c); par(c) = r; c = n }
      r
    }
    var (nE, wSum, chk) = (0L, 0L, 0L)
    pairs.distinct
      .map { case (u, v) => (GraphQueries.mstWeight(u, v), u, v) }
      .sorted
      .foreach { case (w, u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) {
          par(ru) = rv
          nE += 1; wSum += w; chk += u * 1000003L + v * 7919L
        }
      }
    val nComp = nodes.map(find).distinct.size.toLong
    (nE, wSum, chk, nComp)
  }

  private def run(pairs: Seq[(Long, Long)], nodes: Seq[Long]): Unit = {
    import spark.implicits._
    val got = GraphQueries.mstOn(
        pairs.toDF("u", "v"), nodes.toDF("node"))
      .collect()(0)
    val exp = kruskal(pairs, nodes)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === exp)
  }

  test("pencil graph: two triangles, a bridge, and an isolated node") {
    // MSF drops the heaviest edge of each cycle; node 99 stays its own
    // component. Kruskal recomputes that from scratch.
    run(pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
                    (4L, 5L), (4L, 6L), (5L, 6L)),
        nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L, 99L))
  }

  test("path graph: single-chain contraction worst case") {
    // A 40-node path can merge through long pointer chains in few
    // Borůvka rounds — the shape that stresses the contraction CC.
    val path = (1L to 39L).map(i => (i, i + 1))
    run(path, (1L to 40L))
  }

  test("sf0.001 co-purchase forest matches driver Kruskal") {
    val li = Tables.lineitem(spark, sfDir).where(col("l_quantity") >= 45)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nodes = li.select("pk").distinct()
      .collect().map(_.getLong(0)).toSeq
    run(pairs, nodes)
  }
}
