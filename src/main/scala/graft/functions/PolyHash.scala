package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `polyhash(s)` — deterministic polynomial string hash:
  *
  *   h₀ = 0;  hᵢ = (hᵢ₋₁ · 31 + code(cᵢ)) mod 1_000_000_007
  *
  * where `code(c)` is the character's code point (equals the byte value for
  * ASCII). This is graft's portable content-hash primitive for the dedup /
  * fingerprint operators (minhash base hash, simhash token hash, document
  * fingerprint): unlike `hash()`/`xxhash64` it has a closed-form ANSI-SQL
  * definition, so every operator built on it stays oracle-checkable across
  * engines, and unlike `md5()` its output is an integer ready for affine
  * minhash transforms without hex parsing.
  *
  * Implemented as a native Catalyst expression with codegen (a static
  * single-pass loop over the UTF8String bytes — no per-character lambda
  * dispatch, unlike the equivalent `aggregate(split(s,''),...)` HOF chain,
  * which is ~50× slower and breaks whole-stage codegen fusion).
  */
case class PolyHash(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  // Covariant refinement: AbstractDataType is private[sql] in Spark 4, but
  // Seq[DataType] <: Seq[AbstractDataType] satisfies ExpectsInputTypes.
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "polyhash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L
  final val Mul = 31L

  /** Single pass over UTF-16 code units (== code points for BMP text; the
    * engine's text operators tokenize ASCII/latin corpora). Invariant: acc
    * stays < Mod so acc*31+c < 2^35, no overflow.
    *
    * Fast path: pure-ASCII payloads (the overwhelming case in the hot
    * loops — shingle hashes over normalized [a-z0-9 ] text) fold directly
    * over the UTF-8 bytes, which equal the UTF-16 code units, skipping the
    * String decode + allocation entirely. Non-ASCII falls back to the
    * decoded string so the result is identical either way.
    */
  def hash(s: UTF8String): Long = {
    val b = s.getBytes
    var acc = 0L
    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i)
      if (c < 0) return hashSlow(s.toString) // non-ASCII byte → decode
      acc = (acc * Mul + c.toLong) % Mod
      i += 1
    }
    acc
  }

  /** Same fold over a JVM String (UTF-16 code units) — for driver-side
    * references and typed streaming state that must agree with the
    * columnar expression bit-for-bit.
    */
  def hashString(str: String): Long = hashSlow(str)

  private def hashSlow(str: String): Long = {
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      acc = (acc * Mul + str.charAt(i).toLong) % Mod
      i += 1
    }
    acc
  }

  def polyhash(c: Column): Column = Bridge.column(PolyHash(Bridge.expression(c)))
}
