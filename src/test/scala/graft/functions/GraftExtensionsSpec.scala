package graft.functions

import org.apache.spark.sql.SparkSession

import graft.SparkSpec

/** Pins the DEPLOYMENT path: a session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` gets the
  * custom expressions, the range-join optimizer rule, and the
  * per-key top-k planner strategy without any runtime registration —
  * the contract a spark-submit user relies on. (All other suites
  * exercise the runtime-registration path.)
  */
class GraftExtensionsSpec extends SparkSpec {

  test("the extensions injector wires functions, rule, and strategy") {
    val base = spark // force the shared session (and its context) alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // Reuses base's SparkContext; builds a NEW session through the
      // injector. withExtensions exercises the same GraftExtensions
      // code path that `spark.sql.extensions` loads — the static conf
      // itself cannot apply against an already-running context (Spark
      // reads it at context creation), which is exactly why the
      // injector must be correct: in deployment it runs ONCE.
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne base, "expected a fresh session for the extensions path")
      // expression registered in SQL
      val dot = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .collect()(0).getDouble(0)
      assert(dot === 11.0)
      // planner strategy present without graftsql.addStrategy
      assert(s2.sessionState.planner.strategies
        .contains(graft.plans.TopKPerKeyStrategy))
      // optimizer rule present
      assert(s2.sessionState.optimizer.extendedOperatorOptimizationRules
        .contains(graft.plans.RangeBucketJoin))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
