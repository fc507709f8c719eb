package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `edit_dist_tokens(a, b)` — Levenshtein distance between two TOKEN
  * arrays (unit insert/delete/substitute costs), as a native codegen
  * expression: the word-level edit distance behind WER (word error
  * rate). Spark's builtin `levenshtein` is character-level; WER needs
  * token-level alignment (substituting one word is ONE error however
  * long the word). Token equality is exact binary UTF8 comparison —
  * normalize upstream, like [[LcsTokens]].
  *
  * Standard two-row DP over `min(up+1, left+1, diag+cost)` — O(|a|·|b|)
  * time, O(|b|) space, no allocation beyond the rolling rows; runs
  * inside whole-stage codegen via the static `compute`. Callers bound
  * the quadratic cost by truncating both arrays upstream (the q363
  * ROUGE-L contract).
  */
case class EditDistTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "edit_dist_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<STRING>, ARRAY<STRING>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EditDistTokens.compute(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EditDistTokens.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): EditDistTokens = copy(newLeft, newRight)
}

object EditDistTokens {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0) return m
    if (m == 0) return n
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    j = 0
    while (j <= m) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      cur(0) = i
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      j = 1
      while (j <= m) {
        val eq = ai != null && bs(j - 1) != null && ai.equals(bs(j - 1))
        var v = prev(j) + 1                       // delete from a
        if (cur(j - 1) + 1 < v) v = cur(j - 1) + 1 // insert into a
        val d = prev(j - 1) + (if (eq) 0 else 1)   // match/substitute
        if (d < v) v = d
        cur(j) = v
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m)
  }

  def editDistTokens(a: Column, b: Column): Column =
    Bridge.column(EditDistTokens(Bridge.expression(a), Bridge.expression(b)))
}
