package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftsql
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd row hash matching [[graft.sources.AuditSink.rowHash]]:
  * FNV-64 constants (offset 14695981039346656037, prime 1099511628211 —
  * public domain), folded left-to-right over the LONG arguments with
  * `h = (h ^ v) * prime` in WRAPPING 64-bit arithmetic.
  *
  * Why a custom expression and not built-ins: the multiply wraps mod
  * 2^64 by design, and under ANSI mode (Spark 4's default) every
  * built-in long multiply throws on overflow — there is no wrapping
  * multiply in the function library. Java long arithmetic IS the mod-
  * 2^64 semantics, so the kernel is two JVM ops per argument and stays
  * inside whole-stage codegen. DuckDB replays it exactly with HUGEINT
  * mod-2^64 arithmetic (see the src_auditsink_checksum oracle), which
  * is what lets the sink's XOR-FNV integrity fold be hash-gate-graded
  * end-to-end rather than only spec-tested.
  *
  * XOR-folding this hash across rows (the `bit_xor` aggregate) is
  * order- and partitioning-insensitive — the audit-manifest checksum
  * contract.
  */
case class FnvFold(children: Seq[Expression]) extends Expression {
  require(children.nonEmpty, s"$prettyName needs at least one argument")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT arguments, got " +
      children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_fnv_fold"

  override def eval(input: InternalRow): Any = {
    var h = -3750763034362895579L
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      h = (h ^ v.asInstanceOf[Long]) * 1099511628211L
      i += 1
    }
    h
  }

  /** Fold state lives in operator-level mutable fields and each
    * child's (eval + fold step) is a splittable chunk through
    * `splitExpressionsWithCurrentInputs` — the pattern Spark's own
    * `HashExpression` uses — so a very wide argument list compiles as
    * several sub-64KB methods instead of one inline block that would
    * blow the JVM method limit and knock the whole stage back to
    * interpreted eval (ADVICE r9). In whole-stage-codegen contexts the
    * helper inlines when it cannot split; the fallback behavior there
    * is unchanged.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val isNullG = ctx.addMutableState(
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .JAVA_BOOLEAN, "fnvFoldIsNull")
    val valueG = ctx.addMutableState(
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .JAVA_LONG, "fnvFoldValue")
    val chunks = children.map { c =>
      val e = c.genCode(ctx)
      val step = s"$valueG = ($valueG ^ ${e.value}) * 1099511628211L;"
      val guarded =
        if (c.nullable) s"if (${e.isNull}) { $isNullG = true; } else { $step }"
        else step
      s"""
      ${e.code}
      if (!$isNullG) {
        $guarded
      }"""
    }
    val split = ctx.splitExpressionsWithCurrentInputs(chunks)
    ev.copy(code = code"""
      $isNullG = false;
      $valueG = -3750763034362895579L;
      $split
      boolean ${ev.isNull} = $isNullG;
      long ${ev.value} = $valueG;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object FnvFold {
  /** fnvFold(c1, c2, …): BIGINT… → BIGINT, codegen'd wrapping FNV-64
    * fold over the row's values (AuditSink's rowHash).
    */
  def fnvFold(cols: Column*): Column =
    graftsql.columnOf(FnvFold(cols.map(graftsql.expressionOf)))
}
