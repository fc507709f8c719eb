package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `winnow_mins(hashes, w)` — the per-window minima of a gram-hash array
  * (the winnowing selection stage of
  * [[graft.llm.Dedup.winnowingFingerprints]], MOSS SIGMOD'03) in ONE
  * native codegen'd pass with a monotonic deque: O(n) total instead of
  * the HOF form's O(n·w) `array_min(slice(…))` per window — and JIT'd
  * arithmetic instead of an interpreted lambda per window.
  *
  * Contract (mirrors the staged HOF chain it replaces, property-tested
  * in SelectionSpec): `n ≥ w` → the `n−w+1` window minima in order;
  * `1 ≤ n < w` → the single overall min; empty or NULL input → empty
  * array (the chain's `when` conditions all null out to the empty
  * `otherwise`) — hence `nullable = false`. Null ELEMENTS follow
  * `array_min`'s skip semantics (an all-null window yields a null slot);
  * the null path is a separate slow loop so the deque fast path stays
  * branch-light.
  */
case class WinnowMins(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1, "winnow window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "winnow_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WinnowMins.empty
    else WinnowMins.compute(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${childGen.isNull} ? graft.functions.WinnowMins.empty()
          : graft.functions.WinnowMins.compute(${childGen.value}, $w);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WinnowMins = copy(child = newChild)
}

object WinnowMins {

  def empty(): ArrayData = new GenericArrayData(new Array[Any](0))

  def compute(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (n == 0) return empty()
    var i = 0
    var hasNull = false
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (hasNull) return computeWithNulls(a, w)
    if (n < w) {
      // overall min — the chain's array(array_min(hs)) fallback
      var min = a.getLong(0)
      i = 1
      while (i < n) {
        val v = a.getLong(i); if (v < min) min = v; i += 1
      }
      return new GenericArrayData(Array[Any](min))
    }
    // monotonic deque of candidate indexes: front = current window min
    val out = new Array[Any](n - w + 1)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rare path: element nulls present — straightforward per-window scan
    * with array_min's skip-null / all-null→null semantics.
    */
  private def computeWithNulls(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    def minRange(from: Int, until: Int): Any = {
      var min = Long.MaxValue
      var any = false
      var i = from
      while (i < until) {
        if (!a.isNullAt(i)) {
          val v = a.getLong(i); if (!any || v < min) { min = v; any = true }
        }
        i += 1
      }
      if (any) min else null
    }
    if (n < w) new GenericArrayData(Array[Any](minRange(0, n)))
    else {
      val out = new Array[Any](n - w + 1)
      var i = 0
      while (i + w <= n) { out(i) = minRange(i, i + w); i += 1 }
      new GenericArrayData(out)
    }
  }

  def winnowMins(hashes: Column, w: Int): Column =
    Bridge.column(WinnowMins(Bridge.expression(hashes), w))
}
