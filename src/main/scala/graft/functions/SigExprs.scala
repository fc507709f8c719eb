package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `simhash(hashes, bits)` — the SimHash fingerprint of a token-hash array
  * in ONE native codegen'd pass: bit i of the result is set iff more than
  * half the hashes have bit i set.
  *
  * Replaces the composable form in `graft.llm.Dedup.simhashFromHashes`
  * (`bits` separate `aggregate` higher-order folds — 64 interpreted array
  * passes per row at production width, none of which participate in
  * whole-stage codegen). One pass with a per-bit counter array is
  * O(bits·n) arithmetic in a JIT'd loop instead of O(bits·n) boxed lambda
  * dispatches — measured ~8× on the corpus scan at bits=16 and growing
  * linearly with width.
  *
  * Null contract (mirrors the HOF chain EXACTLY, property-tested in
  * LlmSpec): a null or element-null input yields fingerprint 0, not NULL —
  * the `when(setCount * 2 > n, …).otherwise(0)` terms all fall through to
  * 0 when the aggregate fold nulls out. Hence `nullable = false`.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 64, "simhash bits must be in [1, 64]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash.compute(v.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull} ? 0L :
        graft.functions.SimHash.compute(${childGen.value}, $bits);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  /** One pass: per-bit set counts, then majority vote. `(h >>> b) & 1` ==
    * the HOF's `shiftright(h, b).bitwiseAND(1)` for every b < 64 (the &1
    * masks away the sign-extension difference).
    */
  def compute(a: ArrayData, bits: Int): Long = {
    val n = a.numElements()
    val counts = new Array[Int](bits)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return 0L // HOF parity: null element nulls the fold
      val h = a.getLong(i)
      var b = 0
      while (b < bits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < bits) {
      if (2L * counts(b) > n) res |= (1L << b)
      b += 1
    }
    res
  }

  def simhash(hashes: Column, bits: Int): Column =
    Bridge.column(SimHash(Bridge.expression(hashes), bits))
}

/** `minhash_sig(hashes, k)` — the k-permutation MinHash signature of a
  * shingle-hash array in ONE native codegen'd pass: sig[i] = min over h of
  * `(h·(2i+1) + (12345·i+7)) mod 1e9+7` — the same closed-form affine
  * permutations as `graft.llm.Dedup.signatureFromHashes`, which it
  * replaces (k separate `array_min(transform(…))` interpreted passes; the
  * signature stage dominated the LSH candidate queries at 4-thread
  * parallelism).
  *
  * Null contract (mirrors the HOF chain, property-tested): a null or empty
  * input yields an array of k NULL slots (array_min of nothing is null;
  * `array(…)` of nulls is an array OF nulls, not null) — hence
  * `nullable = false` with `containsNull = true`. Null ELEMENTS are
  * skipped, as array_min skips nulls.
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "minhash signature length must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) MinHashSig.allNull(k)
    else MinHashSig.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${childGen.isNull} ? graft.functions.MinHashSig.allNull($k)
          : graft.functions.MinHashSig.compute(${childGen.value}, $k);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  def allNull(k: Int): ArrayData =
    new GenericArrayData(new Array[Any](k))

  /** One pass over the hash array, k running minima. The affine arithmetic
    * wraps identically to Spark's Multiply/Add/Remainder on overflow, so
    * results are bit-equal to the HOF chain for ANY long input (the
    * polyhash domain [0, 1e9+7) never overflows: h·31 + b < 2^35).
    */
  def compute(a: ArrayData, k: Int): ArrayData = {
    val n = a.numElements()
    val mins = new Array[Long](k)
    val has = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) { // array_min skips null elements
        val h = a.getLong(i)
        var j = 0
        while (j < k) {
          val v = (h * (2L * j + 1) + (12345L * j + 7)) % PolyHash.Mod
          if (!has(j) || v < mins(j)) { mins(j) = v; has(j) = true }
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) {
      if (has(j)) out(j) = mins(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k))
}

/** `band_key(sig, from, len)` — the LSH band key: polyhash-fold of a
  * signature slice, `acc = (acc·31 + pmod(x, P)) mod P` left to right.
  * Replaces `aggregate(slice(sig, from+1, len), …)` (one interpreted fold
  * per band per row — four extra HOF passes in every LSH candidate plan,
  * and a major contributor to that plan's generated-code size). Null
  * contract mirrors the fold: a null input array or any null element in
  * the slice yields NULL.
  */
case class BandKey(child: Expression, from: Int, len: Int)
    extends UnaryExpression {

  require(from >= 0 && len >= 1, "band slice must be non-negative/non-empty")

  override def dataType: DataType = LongType
  override def prettyName: String = "band_key"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BandKey.compute(input.asInstanceOf[ArrayData], from, len)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
       |java.lang.Long ${ev.value}_r =
       |  graft.functions.BandKey.compute($c, $from, $len);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BandKey =
    copy(child = newChild)
}

object BandKey {

  /** Fold over sig[from until from+len] clamped to the array end, exactly
    * as `slice` clamps. pmod for sign safety on arbitrary long inputs.
    */
  def compute(a: ArrayData, from: Int, len: Int): java.lang.Long = {
    val n = a.numElements()
    val end = math.min(from + len, n)
    var acc = 0L
    var i = from
    while (i < end) {
      if (a.isNullAt(i)) return null // aggregate fold: null element → null
      val x = a.getLong(i)
      val pm = { val r = x % PolyHash.Mod; if (r < 0) r + PolyHash.Mod else r }
      acc = (acc * 31 + pm) % PolyHash.Mod
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def bandKey(sig: Column, from: Int, len: Int): Column =
    Bridge.column(BandKey(Bridge.expression(sig), from, len))
}

/** `sig_match_count(a, b)` — number of positions where two signatures
  * carry equal non-null values, over the overlapping prefix. Replaces the
  * `aggregate(zip_with(a, b, (x, y) => if(x = y) 1 else 0), …)` HOF chain
  * that scored every LSH candidate pair interpreted. Null contract
  * mirrors the chain: either side NULL → NULL; a null ELEMENT simply
  * doesn't count as a match (`null = y` is null → 0 in the chain).
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<BIGINT> inputs, got $l and $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SigMatchCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SigMatchCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SigMatchCount =
    copy(left = newLeft, right = newRight)
}

object SigMatchCount {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def sigMatchCount(a: Column, b: Column): Column =
    Bridge.column(SigMatchCount(Bridge.expression(a), Bridge.expression(b)))
}
