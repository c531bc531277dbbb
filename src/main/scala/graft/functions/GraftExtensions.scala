package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom Catalyst expressions, both as a
  * `SparkSessionExtensions` injector (set
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build — the deployment path) and as a runtime registrar for an
  * already-running session (tests, notebooks).
  */
object GraftFunctions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
     new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
     (children: Seq[Expression]) => {
       require(children.length == 2, "graft_dot takes exactly 2 arguments")
       DotProduct(children(0), children(1))
     }),
    (FunctionIdentifier("graft_trigram_hashes"),
     new ExpressionInfo(classOf[TrigramHashes].getName, "graft_trigram_hashes"),
     (children: Seq[Expression]) => {
       require(children.length == 1, "graft_trigram_hashes takes exactly 1 argument")
       TrigramHashes(children.head)
     }),
    (FunctionIdentifier("graft_cdc_cuts"),
     new ExpressionInfo(classOf[CdcCuts].getName, "graft_cdc_cuts"),
     (children: Seq[Expression]) => {
       require(children.length == 1, "graft_cdc_cuts takes exactly 1 argument")
       CdcCuts(children.head)
     }),
    (FunctionIdentifier("graft_pq_assign"),
     new ExpressionInfo(classOf[PqAssign].getName, "graft_pq_assign"),
     (children: Seq[Expression]) => {
       require(children.length == 1, "graft_pq_assign takes exactly 1 argument")
       PqAssign(children.head)
     }),
    (FunctionIdentifier("graft_fnv_fold"),
     new ExpressionInfo(classOf[FnvFold].getName, "graft_fnv_fold"),
     (children: Seq[Expression]) => FnvFold(children)))

  def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)

  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point: custom expressions, the
  * range-join bucketing optimizer rule, and the per-key top-k planner
  * strategy (the runtime-registration equivalents are
  * `GraftFunctions.register(spark)`,
  * `spark.experimental.extraOptimizations :+= RangeBucketJoin`, and
  * `graftsql.addStrategy(spark, TopKPerKeyStrategy)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RangeBucketJoin)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
