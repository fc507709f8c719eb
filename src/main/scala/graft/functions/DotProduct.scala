package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `dot(a, b)` — sequential double dot product of two numeric arrays as ONE
  * native codegen'd expression.
  *
  * Semantically identical to the composable HOF form
  * `aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
  * 0d, (acc, v) => acc + v)` (same left-to-right accumulation order, so
  * bit-identical doubles — the cross-engine oracle contract), but HOF trees
  * execute interpreted and allocate an intermediate product array per row.
  * At 100 TB the embedding scan is cosine-bound, so this loop IS the
  * similarity family's hot path: brute-force/ANN/IVF top-k and embedding
  * near-dup all fold through it three times per pair (a·b, a·a, b·b).
  *
  * Any numeric element type is accepted (float/double embeddings, int/long
  * quantized vectors) and widens exactly at read time — the same contract
  * as the HOF form's `cast("double")`, with no cast pass over the array.
  * A null element or length mismatch yields NULL, exactly as the
  * zip_with/aggregate chain does.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot"

  private def kindOf(dt: DataType): Int = dt match {
    case DoubleType => 0
    case FloatType => 1
    case LongType => 2
    case IntegerType => 3
    case ShortType => 4
    case ByteType => 5
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if kindOf(lt) >= 0 && kindOf(rt) >= 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects numeric array inputs, got $l and $r")
    }

  private lazy val leftKind =
    kindOf(left.dataType.asInstanceOf[ArrayType].elementType)
  private lazy val rightKind =
    kindOf(right.dataType.asInstanceOf[ArrayType].elementType)

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftKind, rightKind)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
       |java.lang.Double ${ev.value}_r = graft.functions.DotProduct.compute(
       |  $a, $b, $leftKind, $rightKind);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

object DotProduct {

  private def read(a: ArrayData, i: Int, kind: Int): Double = kind match {
    case 0 => a.getDouble(i)
    case 1 => a.getFloat(i).toDouble
    case 2 => a.getLong(i).toDouble
    case 3 => a.getInt(i).toDouble
    case 4 => a.getShort(i).toDouble
    case 5 => a.getByte(i).toDouble
  }

  /** Sequential fold; returns null on length mismatch or any null element
    * (the zip_with/aggregate chain's semantics).
    */
  def compute(a: ArrayData, b: ArrayData, aKind: Int,
      bKind: Int): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += read(a, i, aKind) * read(b, i, bKind)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
