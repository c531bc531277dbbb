package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftsql
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-trigram xxhash64 signatures of a tokenized document:
  * `array<string>` words → `array<long>` of xxhash64(w[i] ' ' w[i+1]
  * ' ' w[i+2]) for every window, first-occurrence order, deduplicated.
  *
  * Purpose-built for the n-gram jaccard inverted index: the built-in
  * formulation (`transform(sequence(...)) → concat_ws → array_distinct`)
  * interprets three higher-order lambdas per row and pays
  * `array_distinct`'s quadratic string comparisons; this expression is
  * one compiled pass with a hash-set dedup, and it emits the 64-bit
  * join keys directly (hash values identical to the SQL `xxhash64` of
  * the same trigram string — same seed 42, same UTF8 bytes).
  *
  * The heavy loop lives in a static helper the generated code calls, so
  * the expression stays inside whole-stage codegen without inlining a
  * string-building loop into janino.
  */
case class TrigramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_trigram_hashes"

  override def nullSafeEval(words: Any): Any =
    TrigramHashes.compute(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrigramHashes {
  private val Space = UTF8String.fromString(" ")

  /** Static entry point shared by interpreted eval and generated code. */
  def compute(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - 2)
    var m = 0
    var i = 0
    while (i + 2 < n) {
      val g = UTF8String.concatWs(Space, words.getUTF8String(i),
        words.getUTF8String(i + 1), words.getUTF8String(i + 2))
      val h = XxHash64Function.hash(g, StringType, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  def apply(c: Column): Column =
    graftsql.columnOf(TrigramHashes(graftsql.expressionOf(c)))
}
