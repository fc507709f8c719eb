package graft

import org.apache.spark.sql.functions._

/** Hand-value pins for the q352-q353 wave: Kneser–Ney bigram smoothing,
  * chrF character F-score.
  */
class LmEvalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("kneserNeyBigrams: textbook D=3/4 values; per-context mass " +
      "sums to ~1e6") {
    // corpus: "a b", "a b", "a c" -> c(a b)=2, c(a c)=1, B=2 types,
    // c(a)=3, N1+(a.)=2, N1+(.b)=N1+(.c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val r = graft.llm.Lexical.kneserNeyBigrams(docs, "doc_id", "text", 1L)
      .collect().map(x => x.getString(0) -> x).toMap
    val ab = r("a b")
    // term1 = (4*2-3)*250000 DIV 3 = 416666; term2 = 2*1*750000 DIV 6
    // = 250000
    assert(ab.getLong(1) == 2 && ab.getLong(2) == 3 &&
      ab.getLong(3) == 2 && ab.getLong(4) == 1)
    assert(ab.getLong(5) == 666666L)
    // term1 = 1*250000 DIV 3 = 83333; term2 = 250000
    assert(r("a c").getLong(5) == 333333L)
    // discounted mass redistributed: sum within 2 micro per floor
    assert(r.values.map(_.getLong(5)).sum == 999999L)
  }

  test("kneserNeyBigrams: minCount filters the table, model stats " +
      "still corpus-wide") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val r = graft.llm.Lexical.kneserNeyBigrams(docs, "doc_id", "text", 2L)
      .collect()
    assert(r.length == 1 && r(0).getString(0) == "a b")
    // c_u still counts the filtered-out "a c" occurrence
    assert(r(0).getLong(2) == 3)
  }

  test("chrF: identical pair scores 1e6, disjoint pair 0, one-sided " +
      "short text scores partial via f2 = 0") {
    val docs = Seq((1L, "ab"), (2L, "ab"), (3L, "cd"), (4L, "a"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 1L)).toDF("c", "r")
    val out = graft.llm.Eval.chrFCorpus(docs, pairs, "doc_id", "text",
        "c", "r")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    val same = out((1L, 2L))
    assert(same.getLong(8) == 1000000L && same.getLong(9) == 1000000L &&
      same.getLong(10) == 1000000L)
    val disj = out((1L, 3L))
    assert(disj.getLong(2) == 0 && disj.getLong(10) == 0L)
    // cand "a": h1=1 r1=2 m1=1 -> f1 = 5e6/(8+1) = 555555;
    // no cand bigrams: m2=0 h2=0 r2=1 -> f2 = 0; chrf = 277777
    val short = out((4L, 1L))
    assert(short.getLong(8) == 555555L && short.getLong(9) == 0L &&
      short.getLong(10) == 277777L)
  }

  test("chrF: both-empty pair reports null chrf (no denominator), " +
      "one-sided empty scores 0") {
    val docs = Seq((1L, "!!!"), (2L, "???"), (3L, "ab"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("c", "r")
    val out = graft.llm.Eval.chrFCorpus(docs, pairs, "doc_id", "text",
        "c", "r")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    assert(out((1L, 2L)).isNullAt(10))
    assert(out((1L, 3L)).getLong(10) == 0L)
  }

  test("CharGramCounts: the native fold matches the composed " +
      "per-position explode on varied strings (incl. empty and " +
      "shorter-than-n)") {
    val texts = Seq("", "a", "ab", "aaa", "abcabc abc",
      "the quick brown fox the quick", "0 1 0 1 0")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "s")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select(col("id"),
          explode(graft.functions.CharGramCounts
            .charGramCounts(col("s"), n)))
        .select(col("id"), col("key"), col("value"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val composed = df.select(col("id"),
          explode(expr(s"CASE WHEN char_length(s) >= $n THEN " +
            s"transform(sequence(1, char_length(s) - ${n - 1}), " +
            s"i -> substring(s, i, $n)) " +
            "ELSE CAST(array() AS ARRAY<STRING>) END")).as("gram"))
        .groupBy(col("id"), col("gram")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(native == composed, s"n=$n")
    }
  }
}
