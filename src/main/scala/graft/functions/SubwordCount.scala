package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `subword_count(text)` — number of BPE-ish pre-tokenizer runs: maximal
  * runs of letters, of digits, and of other non-whitespace symbols, over
  * the lowercased text. Exactly `regexp_count(lower(text),
  * '[a-z]+|[0-9]+|[^a-z0-9\s]+')` (the oracle form), but as one codegen'd
  * char scan instead of a regex engine pass — the corpus-wide token-count
  * scan is a hot loop of the text-analysis family.
  */
case class SubwordCount(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "subword_count"

  override def nullSafeEval(input: Any): Any =
    SubwordCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SubwordCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
}

object SubwordCount {

  /** The explicit whitespace class of [[graft.llm.Text.subwordPattern]]
    * ([ \t\n\f\r] — deliberately excludes \x0B, where Java's `\s` and
    * RE2's `\s` disagree), so native, Java-regex, and DuckDB counts are
    * identical byte-for-byte.
    */
  private def isRegexWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def count(s: UTF8String): Int = {
    val text = s.toLowerCase.toString
    var n = 0
    var prev = -1 // class of previous char, -1 = start/whitespace boundary
    var i = 0
    val len = text.length
    while (i < len) {
      val c = text.charAt(i)
      val k =
        if (c >= 'a' && c <= 'z') 0
        else if (c >= '0' && c <= '9') 1
        else if (isRegexWs(c)) 3
        else 2
      if (k != 3 && k != prev) n += 1
      prev = if (k == 3) -1 else k
      i += 1
    }
    n
  }

  def subwordCount(text: Column): Column =
    Bridge.column(SubwordCount(Bridge.expression(text)))
}
