package graft

import org.apache.spark.sql.functions._
import graft.functions.LcsTokens.lcsTokens

/** Hand-value pins for q363: native token-LCS expression and ROUGE-L. */
class RougeLWaveSpec extends SparkSpec {
  import spark.implicits._

  test("lcsTokens: subsequence (not substring), identity, disjoint, " +
      "empty") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d"), Seq("b", "d", "e")),
      (2L, Seq("x", "y"), Seq("x", "y")),
      (3L, Seq("a"), Seq("b")),
      (4L, Seq.empty[String], Seq("a"))
    ).toDF("id", "a", "b")
    val r = df.select(col("id"), lcsTokens(col("a"), col("b")).as("l"))
      .as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 2, 2L -> 2, 3L -> 0, 4L -> 0))
  }

  test("lcsTokens: order sensitivity — reversed tokens share only one") {
    val df = Seq((1L, Seq("a", "b", "c"), Seq("c", "b", "a")))
      .toDF("id", "a", "b")
    val r = df.select(lcsTokens(col("a"), col("b"))).collect()(0).getInt(0)
    assert(r == 1)
  }

  test("rougeL: exact integer F, one-sided empty scores 0, both-empty " +
      "null, truncation cap applies") {
    val docs = Seq((1L, "a b c"), (2L, "a c"), (3L, "!!!"), (4L, "???"),
      (5L, "a b c d e f")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 1L))
      .toDF("c", "r")
    val out = graft.llm.Eval.rougeL(docs, pairs, "doc_id", "text",
        "c", "r", maxTokens = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    // lcs("a b c","a c") = 2 -> 2*2e6 DIV 5 = 800000
    assert(out((1L, 2L)).getLong(4) == 2 &&
      out((1L, 2L)).getLong(5) == 800000L)
    assert(out((3L, 2L)).getLong(5) == 0L)
    assert(out((3L, 4L)).isNullAt(5))
    // doc 5 truncated to 3 tokens: lcs("a b c","a b c") = 3,
    // f = 2*3e6 DIV 6 = 1e6
    assert(out((5L, 1L)).getLong(2) == 3 &&
      out((5L, 1L)).getLong(5) == 1000000L)
  }
}
