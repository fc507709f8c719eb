package graft.functions

import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd forms of the text-analysis hot paths in
  * [[graft.llm.Text]]. Each is semantically IDENTICAL to the composable
  * Column chain it accelerates (property-tested side by side in LlmSpec) —
  * the chains are higher-order-function trees, which Spark executes
  * interpreted (HOFs don't join whole-stage codegen and defeat common
  * subexpression elimination), and the corpus-scan queries they power
  * (token counts, language ID, quality, repetition) are projection-bound.
  *
  * Tokenizer contract shared by all of them (lockstep with
  * `Text.normalize`/`Text.tokens`, the ShingleHashes expression, and the
  * ANSI-SQL oracles): lowercase the whole string, then tokens are maximal
  * runs of `[a-z0-9]`.
  */
private[functions] object TokenScan {

  /** (start, end) offsets of each token run in the lowercased text. */
  def offsets(text: String): (mutable.ArrayBuffer[Int], mutable.ArrayBuffer[Int]) = {
    val starts = mutable.ArrayBuffer.empty[Int]
    val ends = mutable.ArrayBuffer.empty[Int]
    var i = 0
    var inTok = false
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep && !inTok) { starts += i; inTok = true }
      if (!keep && inTok) { ends += i; inTok = false }
      i += 1
    }
    if (inTok) ends += n
    (starts, ends)
  }
}

/** `tokens(text)` — the normalized whitespace token array as one native
  * char scan (replaces regexp_replace + split + interpreted filter-HOF).
  */
case class Tokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Tokens.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokens.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {

  def compute(s: UTF8String): ArrayData = {
    val text = s.toLowerCase.toString
    val (starts, ends) = TokenScan.offsets(text)
    val out = new Array[Any](starts.length)
    var t = 0
    while (t < starts.length) {
      out(t) = UTF8String.fromString(text.substring(starts(t), ends(t)))
      t += 1
    }
    new GenericArrayData(out)
  }

  def tokens(text: Column): Column =
    Bridge.column(Tokens(Bridge.expression(text)))
}

/** `token_count(text)` — `size(tokens(text))` without materializing the
  * token array: one counting char scan, zero allocation.
  */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenCount.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCount.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {

  def compute(s: UTF8String): Int = {
    val text = s.toLowerCase.toString
    var i = 0
    var inTok = false
    var n = 0
    val len = text.length
    while (i < len) {
      val c = text.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (keep && !inTok) { n += 1; inTok = true }
      else if (!keep) inTok = false
      i += 1
    }
    n
  }

  def tokenCount(text: Column): Column =
    Bridge.column(TokenCount(Bridge.expression(text)))
}

/** `token_hashes(text)` — per-token polyhash array (order kept, duplicates
  * kept — the SimHash base, unlike the DISTINCT `shingle_hashes`).
  * Replaces `transform(tokens(text), polyhash)` with one scan and no
  * intermediate token strings.
  */
case class TokenHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

object TokenHashes {

  def compute(s: UTF8String): ArrayData = {
    val text = s.toLowerCase.toString
    val (starts, ends) = TokenScan.offsets(text)
    val out = new Array[Long](starts.length)
    var t = 0
    while (t < starts.length) {
      var acc = 0L
      var j = starts(t)
      val e = ends(t)
      while (j < e) {
        acc = (acc * PolyHash.Mul + text.charAt(j).toLong) % PolyHash.Mod
        j += 1
      }
      out(t) = acc
      t += 1
    }
    new GenericArrayData(out)
  }

  def tokenHashes(text: Column): Column =
    Bridge.column(TokenHashes(Bridge.expression(text)))
}

/** `stopword_count(toks, words)` — number of array elements contained in
  * the fixed `words` list. Replaces the interpreted
  * `size(filter(toks, t => t.isin(words…)))` chain; as a codegen'd leaf it
  * also participates in common-subexpression elimination, which the
  * language-ID CASE chain relies on (each count is referenced ~7×).
  */
case class StopwordCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "stopword_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got $other")
  }

  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    StopwordCount.compute(input.asInstanceOf[ArrayData], wordSet)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.StopwordCount.compute($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCount =
    copy(child = newChild)
}

object StopwordCount {

  def compute(a: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    val n = a.numElements()
    var i = 0
    var c = 0
    while (i < n) {
      // filter(isin) drops null elements (isin(null) is null, not true)
      if (!a.isNullAt(i) && words.contains(a.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def stopwordCount(toks: Column, words: Seq[String]): Column =
    Bridge.column(StopwordCount(Bridge.expression(toks), words))
}

/** `str_array_len_sum(toks)` — `aggregate(toks, 0L, (a, t) => a +
  * length(t))` as one native pass (character counts, code points like
  * Spark's `length`). A null element nulls the whole fold, as the
  * aggregate chain does.
  */
case class StrArrayLenSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "str_array_len_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got $other")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    StrArrayLenSum.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
       |java.lang.Long ${ev.value}_r = graft.functions.StrArrayLenSum.compute($c);
       |if (${ev.value}_r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): StrArrayLenSum =
    copy(child = newChild)
}

object StrArrayLenSum {

  def compute(a: ArrayData): java.lang.Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // aggregate fold: null element → null
      acc += a.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  def strArrayLenSum(toks: Column): Column =
    Bridge.column(StrArrayLenSum(Bridge.expression(toks)))
}

/** `jaccard_sets(a, b)` — exact Jaccard similarity of two hash arrays:
  * |distinct(a) ∩ distinct(b)| / |distinct(a) ∪ distinct(b)|, 0.0 when the
  * union is empty OR either side is NULL — exactly the
  * `when(size(array_union…) > 0, …).otherwise(0)` chain in
  * `graft.llm.Dedup.jaccard` (hence `nullable = false`). One hash-set pass
  * instead of two interpreted set-algebra array builds per pair.
  */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "jaccard_sets"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects ARRAY<BIGINT> inputs, got $l and $r")
    }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) 0d
    else JaccardSets.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${leftGen.code}
      ${rightGen.code}
      double ${ev.value} = (${leftGen.isNull} || ${rightGen.isNull}) ? 0.0 :
        graft.functions.JaccardSets.compute(${leftGen.value}, ${rightGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardSets = copy(left = newLeft, right = newRight)
}

object JaccardSets {

  def compute(a: ArrayData, b: ArrayData): Double = {
    val setA = new java.util.HashSet[java.lang.Long](a.numElements() * 2)
    var aNull = false
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) aNull = true else setA.add(a.getLong(i))
      i += 1
    }
    var inter = 0
    var bOnly = 0
    var bNull = false
    val seenB = new java.util.HashSet[java.lang.Long](b.numElements() * 2)
    i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bNull = true
      else {
        val v: java.lang.Long = b.getLong(i)
        if (seenB.add(v)) { if (setA.contains(v)) inter += 1 else bOnly += 1 }
      }
      i += 1
    }
    // null elements behave as one shared sentinel value, matching
    // array_intersect/array_union null semantics: the union gains ONE slot
    // if either side holds a null, the intersection one if both do
    if (aNull && bNull) inter += 1
    val union = setA.size() + bOnly + (if (aNull || bNull) 1 else 0)
    if (union > 0) inter.toDouble / union else 0d
  }

  def jaccardSets(a: Column, b: Column): Column =
    Bridge.column(JaccardSets(Bridge.expression(a), Bridge.expression(b)))
}

/** `top_ngram_fraction(toks, n)` — fraction of the document's word
  * n-grams taken by the single most frequent one (the Gopher boilerplate
  * rule): one hash-count pass, replacing the O(distinct × grams)
  * interpreted `transform(array_distinct(grams), g => size(filter(…)))`
  * chain composed on an `ngrams` build. 0.0 for NULL input or docs
  * shorter than n words — the composed chain's `when(size > 0)` guard
  * (hence `nullable = false`). Null token elements are skipped inside a
  * gram, as `array_join` skips them.
  */
case class TopNgramFraction(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "ngram width must be >= 1")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "top_ngram_fraction"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<STRING>, got $other")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0d
    else TopNgramFraction.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      double ${ev.value} = ${childGen.isNull} ? 0.0 :
        graft.functions.TopNgramFraction.compute(${childGen.value}, $n);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TopNgramFraction =
    copy(child = newChild)
}

object TopNgramFraction {

  def compute(toks: ArrayData, n: Int): Double = {
    val total = toks.numElements() - n + 1
    if (total <= 0) return 0d
    val counts = new java.util.HashMap[String, Int](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    var best = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        if (!toks.isNullAt(i + j)) { // array_join skips nulls
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
          first = false
        }
        j += 1
      }
      val g = sb.toString
      val c = counts.merge(g, 1, (x, y) => x + y)
      if (c > best) best = c
      i += 1
    }
    best.toDouble / total
  }

  def topNgramFraction(toks: Column, n: Int): Column =
    Bridge.column(TopNgramFraction(Bridge.expression(toks), n))
}

/** `mod_filter_sorted(hashes, m)` — `array_sort(filter(hs, h => h % m ==
  * 0))`, the winnowing fingerprint selection, in one pass (the filter HOF
  * runs interpreted per shingle). Element null handling is moot (shingle
  * hash arrays are containsNull = false) but mirrored anyway: filter drops
  * nulls since `null % m` is null, not 0.
  */
case class ModFilterSorted(child: Expression, m: Int)
    extends UnaryExpression {

  require(m >= 1, "modulus must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "mod_filter_sorted"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    ModFilterSorted.compute(input.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ModFilterSorted.compute($c, $m)")

  override protected def withNewChildInternal(newChild: Expression): ModFilterSorted =
    copy(child = newChild)
}

object ModFilterSorted {

  def compute(a: ArrayData, m: Int): ArrayData = {
    val n = a.numElements()
    val buf = new mutable.ArrayBuffer[Long](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        if (h % m == 0) buf += h
      }
      i += 1
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  def modFilterSorted(hashes: Column, m: Int): Column =
    Bridge.column(ModFilterSorted(Bridge.expression(hashes), m))
}

/** `nfc_normalize(text)` — Unicode NFC canonical composition (combining
  * sequences fold to precomposed codepoints: `e`+U+0301 → `é`), the
  * standard pre-tokenization normalization a multilingual training corpus
  * needs before hashing/dedup — two canonically-equivalent byte sequences
  * must not count as distinct documents. Spark has no builtin; this wraps
  * `java.text.Normalizer` as a codegen'd expression with an ASCII
  * fast path (the overwhelming case — no allocation, no normalization
  * pass). Oracle twin: DuckDB's `nfc_normalize` (both implement the
  * stability-guaranteed Unicode canonical composition, property-tested
  * equal in the gate).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  def compute(s: UTF8String): UTF8String = {
    // byte-indexed probe, NOT getBytes: UnsafeRow-backed strings are
    // buffer slices and getBytes would copy the payload the fast path
    // exists to avoid
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0)
        return UTF8String.fromString(java.text.Normalizer.normalize(
          s.toString, java.text.Normalizer.Form.NFC))
      i += 1
    }
    s // ASCII is NFC by construction — zero-copy pass-through
  }

  def nfcNormalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))
}

/** `token_ngrams(text, n)` — the word n-gram STRINGS of the normalized
  * text (members joined with one space), in one scan. Replaces the
  * `transform(sequence(…), i => array_join(slice(toks, i+1, n), " "))`
  * chain, whose guard/sequence/slice reference the token argument 4× (the
  * tokenizer ran 4× per row when composed directly) and whose per-gram
  * lambda executes interpreted. Contract identical to
  * `Text.ngrams(Text.tokens(text), n)` (property-tested): null → null,
  * fewer than n tokens → empty array.
  */
case class TokenNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "ngram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenNgrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenNgrams.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenNgrams =
    copy(child = newChild)
}

object TokenNgrams {

  def compute(s: UTF8String, n: Int): ArrayData = {
    val text = s.toLowerCase.toString
    val (starts, ends) = TokenScan.offsets(text)
    val nTok = starts.length
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nTok - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= nTok - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(text, starts(i + j), ends(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def tokenNgrams(text: Column, n: Int): Column =
    Bridge.column(TokenNgrams(Bridge.expression(text), n))
}

/** `char_gram_counts(text, n)` — the character n-gram COUNT MAP of the
  * (caller-normalized) text, folded row-local in one scan: gram → count
  * for every length-`n` substring, `{}` when the text is shorter than
  * `n`. The chrF hot path ([[graft.llm.Eval.chrFCorpus]]): the composed
  * form explodes one row PER CHARACTER POSITION (a ~1000-row fan-out per
  * kB of text, twice — order 1 and 2) and re-aggregates it to (doc,
  * gram) grain through a shuffle, spilling at sf10; this expression
  * emits the (gram, count) pairs already folded, so the downstream
  * explode is alphabet-bounded (≤ 37ⁿ distinct grams per doc under the
  * tokenizer normalization) and the (doc, gram) aggregate exchange
  * disappears entirely. Counts are exact; gram order in the map is
  * first-appearance (irrelevant downstream — the map is exploded into
  * unordered rows).
  */
case class CharGramCounts(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "char_gram_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CharGramCounts.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CharGramCounts.compute($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): CharGramCounts =
    copy(child = newChild)
}

object CharGramCounts {

  def compute(s: UTF8String, n: Int): MapData = {
    val text = s.toString
    val len = text.length
    val m = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i + n <= len) {
      val g = text.substring(i, i + n)
      val c = m.get(g)
      m.put(g, if (c == null) 1L else c + 1L)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = UTF8String.fromString(e.getKey)
      vals(k) = e.getValue.longValue()
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys),
      new GenericArrayData(vals))
  }

  def charGramCounts(text: Column, n: Int): Column =
    Bridge.column(CharGramCounts(Bridge.expression(text), n))
}
