package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftsql
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`) runs
  * the lambda interpreted per element; an unrolled 64-term expression
  * tree blows up generated-code size instead. A purpose-built expression
  * emits a tight primitive loop over UnsafeArrayData and stays inside
  * whole-stage codegen — the right tool for a quadratic-candidate
  * similarity kernel.
  *
  * Accumulation is left-to-right, matching the interpreted fallback and
  * DuckDB's list_sum fold, so results are bit-identical across engines.
  * Null array elements are not expected (embeddings are dense); null
  * inputs propagate to null via nullIntolerant.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, " +
      s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $x.getDouble($i) * $y.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** dot(a, b): array<double> × array<double> → double, codegen'd. */
  def dot(a: Column, b: Column): Column =
    graftsql.columnOf(DotProduct(graftsql.expressionOf(a), graftsql.expressionOf(b)))
}
