package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_hashes(text, width)` — the distinct polyhash set of word
  * `width`-grams of the normalized text, as ONE native codegen'd pass.
  *
  * Semantically identical (property-tested against 5k docs) to the
  * composable Column form
  * `array_distinct(transform(ngrams(tokens(text), w), polyhash))`
  * (`graft.llm.Text`), but that chain is a higher-order-function tree,
  * which Spark executes interpreted (HOFs don't participate in whole-stage
  * codegen) and allocates a string per shingle. This expression normalizes,
  * tokenizes, rolls the hash across each shingle's characters, and dedups
  * in a single loop with zero per-shingle allocation — the throughput
  * backbone of the dedup family at corpus scale.
  *
  * Normalization contract (must stay in lockstep with `Text.normalize` /
  * `Text.tokens` and the ANSI-SQL oracles): lowercase, every char outside
  * `[a-z0-9 ]` becomes a space, tokens are space-runs, shingles join with
  * a single space.
  */
case class ShingleHashes(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(width >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {

  /** Ordered, duplicates kept — the winnowing selection stage needs gram
    * POSITIONS, not the set ([[graft.functions.WinnowMins]] slides over
    * this). Same scan, same hash values as [[compute]], no dedup.
    */
  def computeOrdered(s: UTF8String, width: Int): ArrayData = {
    val text = s.toLowerCase.toString
    val n = text.length
    val starts = mutable.ArrayBuffer.empty[Int]
    val ends = mutable.ArrayBuffer.empty[Int]
    var i = 0
    var inTok = false
    while (i < n) {
      val c0 = text.charAt(i)
      val keep = (c0 >= 'a' && c0 <= 'z') || (c0 >= '0' && c0 <= '9')
      if (keep && !inTok) { starts += i; inTok = true }
      if (!keep && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += n
    val nTok = starts.length
    if (nTok < width) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - width + 1)
    var t = 0
    while (t <= nTok - width) {
      var acc = 0L
      var w = 0
      while (w < width) {
        if (w > 0) acc = (acc * PolyHash.Mul + 32L) % PolyHash.Mod // ' '
        var j = starts(t + w)
        val e = ends(t + w)
        while (j < e) {
          acc = (acc * PolyHash.Mul + text.charAt(j).toLong) % PolyHash.Mod
          j += 1
        }
        w += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Single pass: normalize+tokenize (char scan), then per shingle fold the
    * polyhash across the member words with a space (32) between them.
    */
  def compute(s: UTF8String, width: Int): ArrayData = {
    // tokens as (start, end) offsets into the lowercased char array
    val text = s.toLowerCase.toString
    val n = text.length
    val starts = mutable.ArrayBuffer.empty[Int]
    val ends = mutable.ArrayBuffer.empty[Int]
    var i = 0
    var inTok = false
    while (i < n) {
      val c0 = text.charAt(i)
      val keep = (c0 >= 'a' && c0 <= 'z') || (c0 >= '0' && c0 <= '9')
      if (keep && !inTok) { starts += i; inTok = true }
      if (!keep && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += n
    val nTok = starts.length
    if (nTok < width) return new GenericArrayData(Array.empty[Long])
    val seen = mutable.LinkedHashSet.empty[Long]
    var t = 0
    while (t <= nTok - width) {
      var acc = 0L
      var w = 0
      while (w < width) {
        if (w > 0) acc = (acc * PolyHash.Mul + 32L) % PolyHash.Mod // ' '
        var j = starts(t + w)
        val e = ends(t + w)
        while (j < e) {
          acc = (acc * PolyHash.Mul + text.charAt(j).toLong) % PolyHash.Mod
          j += 1
        }
        w += 1
      }
      seen += acc
      t += 1
    }
    new GenericArrayData(seen.toArray)
  }

  def shingleHashes(text: Column, width: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text), width))

  def gramHashes(text: Column, width: Int): Column =
    Bridge.column(GramHashes(Bridge.expression(text), width))
}

/** `gram_hashes(text, width)` — the ORDERED gram-hash list (duplicates
  * kept): [[ShingleHashes]] without the dedup, for position-sensitive
  * consumers (winnowing window minima). Identical normalization and hash
  * values; null text → null (the composable chain's `transform(null)`).
  */
case class GramHashes(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(width >= 1, "gram width must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.computeOrdered(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.computeOrdered($c, $width)")

  override protected def withNewChildInternal(
      newChild: Expression): GramHashes = copy(child = newChild)
}
