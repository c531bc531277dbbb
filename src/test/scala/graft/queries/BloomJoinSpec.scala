package graft.queries

import graft.SparkSpec

/** Pins the plan shape q37_bloom_join claims: InjectRuntimeFilter puts
  * a bloom_filter probe on the big side's scan when the other side is
  * selective and broadcast is unavailable. If a Spark upgrade or conf
  * drift stops the rewrite from firing, this fails — not the gate
  * (semantics are unchanged), because the whole point of the query is
  * the plan.
  */
class BloomJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("q37 plans a runtime bloom filter on the fact-side scan") {
    val df = RelationalQueries.q37BloomJoin(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("bloom"),
      s"no bloom filter in optimized plan:\n${plan.take(2000)}")
  }

  test("q36 recursive CTE plans and the walk terminates at depth 3") {
    val rows = RelationalQueries.q36Reach3(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // reach counts are non-negative and the histogram covers all nodes
    val totalNodes = rows.map(_.getAs[Long]("n_nodes")).sum
    val nodes = Tables.lineitem(spark, sfDir)
      .where("l_quantity >= 45").select("l_partkey").distinct().count()
    assert(totalNodes === nodes)
    rows.foreach(r => assert(r.getAs[Long]("n_reach") >= 0))
  }
}
