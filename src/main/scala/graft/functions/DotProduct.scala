package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot(a, b)` — sequential double dot product of two numeric arrays as ONE
  * native codegen'd expression.
  *
  * Semantically identical to the composable HOF form
  * `aggregate(zip_with(a, b, (x, y) => x*y), 0d, (acc, v) => acc + v)`
  * (same left-to-right accumulation order, so bit-identical doubles — the
  * cross-engine oracle contract), but HOF trees execute interpreted and
  * allocate an intermediate product array per row. At 100 TB the embedding
  * scan is cosine-bound, so this loop IS the similarity family's hot path:
  * brute-force/ANN/IVF top-k and embedding near-dup all fold through it
  * three times per pair (a·b, a·a, b·b).
  *
  * Mixed float/double inputs are handled without a cast pass: float
  * elements widen exactly at read time, matching `x.cast("double")`.
  * A null element or length mismatch yields NULL, exactly as the
  * zip_with/aggregate chain does.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot"

  private def elemOk(dt: DataType): Boolean =
    dt == FloatType || dt == DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<float|double> inputs, got $l and $r")
    }

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
       |java.lang.Double ${ev.value}_r = graft.functions.DotProduct.compute(
       |  $a, $b, $leftIsFloat, $rightIsFloat);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Sequential fold; returns null on length mismatch or any null element
    * (the zip_with/aggregate chain's semantics).
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
