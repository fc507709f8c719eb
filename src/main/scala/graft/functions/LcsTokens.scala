package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lcs_tokens(a, b)` — length of the longest common SUBSEQUENCE of two
  * token arrays, as a native codegen expression: the order-preserving
  * overlap behind ROUGE-L (n-gram overlaps like [[graft.llm.Eval.rougeN]]
  * reward local phrase matches; LCS rewards sentence-level structure
  * without requiring contiguity). Token-level, exact-match equality
  * (binary UTF8 comparison — no normalization here; normalize upstream).
  *
  * Standard two-row DP over the `max(up, left, diag + eq)` recurrence —
  * O(|a|·|b|) time, O(|b|) space per row, no allocation beyond the two
  * rolling rows; inside whole-stage codegen via the static `compute`,
  * like every expression in this package. Callers bound the quadratic
  * cost by truncating the arrays (`slice`) upstream — the q363 contract
  * caps both sides at 80 tokens.
  */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "lcs_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LcsTokens.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LcsTokens.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): LcsTokens = copy(newLeft, newRight)
}

object LcsTokens {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return 0
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      j = 1
      while (j <= m) {
        val eq = ai != null && bs(j - 1) != null && ai.equals(bs(j - 1))
        var v = prev(j)                       // up
        if (cur(j - 1) > v) v = cur(j - 1)    // left
        val d = prev(j - 1) + (if (eq) 1 else 0)
        if (d > v) v = d
        cur(j) = v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  def lcsTokens(a: Column, b: Column): Column =
    Bridge.column(LcsTokens(Bridge.expression(a), Bridge.expression(b)))
}
