package graft

import org.apache.spark.sql.functions._
import graft.engine.Relational
import graft.llm.{Dedup, Lexical}

/** Round-10 quality/audit wave: bigram LM scoring, exact window-dup
  * density, Gini via the distributed global rank, PMI cells, and the
  * k-anonymity violation worklist. Hand-model goldens (the arithmetic is
  * integer-exact) plus the invariants the oracle hash can't see.
  */
class QualityAuditWaveSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long = math.round(x * 1000000d)

  test("bigramLmScore: hand corpus gives exact micro-nat sums") {
    // doc1 "a b a": bigrams (a b)(b a); doc2 "a b": bigram (a b)
    // unigrams a:3 b:2, V=2; c2("a b")=2, c2("b a")=1
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val r = Lexical.bigramLmScore(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    val nllAB = micro(math.log(3 + 2) - math.log(2 + 1))
    val nllBA = micro(math.log(2 + 2) - math.log(1 + 1))
    assert(r(1L).getLong(1) == 2, "doc1 n_bigrams")
    assert(r(1L).getLong(2) == nllAB + nllBA, "doc1 sum")
    assert(r(1L).getLong(3) == (nllAB + nllBA) / 2, "doc1 avg (DIV)")
    assert(r(2L).getLong(1) == 1)
    assert(r(2L).getLong(2) == nllAB)
    // repeated rare bigrams score worse (higher NLL) than repeated
    // common ones: "b a" is rarer than "a b"
    assert(nllBA > nllAB)
  }

  test("bigramLmScore: docs under 2 tokens emit no row; repeats weight " +
      "by count") {
    val docs = Seq((1L, "x"), (2L, ""), (3L, "w w w w")).toDF("doc_id", "text")
    val out = Lexical.bigramLmScore(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
    // unigrams: x:1, w:4 -> V=2; c2("w w")=3; each position:
    // ln(4+2)-ln(3+1); doc3 has 3 positions of the same gram
    val nll = micro(math.log(6) - math.log(4))
    assert(out.head.getLong(2) == 3 * nll)
  }

  test("dupWindowPpm: cross-doc window is a dup, intra-doc repeat is " +
      "not") {
    val docs = Seq((1L, "x y z"), (2L, "x y q"), (3L, "z"),
      (4L, "p p p")).toDF("doc_id", "text")
    val r = Dedup.dupWindowPpm(docs, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc3: 1 token < n -> no row
    assert(!r.contains(3L))
    // "x y" appears in docs 1 and 2 -> dup; "y z","y q" unique
    assert(r(1L).getLong(1) == 2 && r(1L).getLong(2) == 1)
    assert(r(1L).getLong(3) == 500000L)
    assert(r(2L).getLong(2) == 1)
    // doc4: "p p" twice but only in ONE doc -> not dup
    assert(r(4L).getLong(1) == 2 && r(4L).getLong(2) == 0)
  }

  test("giniReport: hand values, uniform zero, and empty-input guard") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("id", "v")
    val ra = Relational.giniReport(a, "v", "id").collect().head
    // S = 1+4+9+16 = 30, T = 10: 2e6*30/40 - 5e6/4 = 250000
    assert(ra.getLong(0) == 4 && ra.getLong(1) == 10)
    assert(ra.getLong(2) == 250000L)
    val u = Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)).toDF("id", "v")
    assert(Relational.giniReport(u, "v", "id").collect().head
      .getLong(2) == 0L, "uniform mass -> 0")
    val e = Seq.empty[(Long, Long)].toDF("id", "v")
    val re = Relational.giniReport(e, "v", "id").collect().head
    assert(re.getLong(0) == 0 && re.getLong(1) == 0 && re.isNullAt(2))
  }

  test("giniReport: rank sum is tie-permutation-invariant (repartition " +
      "invariance)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, (rnd.nextInt(20) + 1).toLong))
    val df = rows.toDF("id", "v")
    val g1 = Relational.giniReport(df, "v", "id").collect().head.getLong(2)
    val g2 = Relational.giniReport(df.repartition(13), "v", "id")
      .collect().head.getLong(2)
    assert(g1 == g2)
  }

  test("pmiTable: hand 2x2 cells in exact micro-nats") {
    val df = Seq(("a1", "b1"), ("a1", "b1"), ("a1", "b2"), ("a2", "b1"))
      .toDF("x", "y")
    val r = Relational.pmiTable(df, "x", "y").collect()
      .map(v => (v.getString(0), v.getString(1)) -> v).toMap
    assert(r.size == 3)
    // N=4, ra(a1)=3, ra(a2)=1, cb(b1)=3, cb(b2)=1
    assert(r(("a1", "b1")).getLong(2) == 2)
    assert(r(("a1", "b1")).getLong(3) ==
      micro(math.log(2) + math.log(4) - math.log(3) - math.log(3)))
    assert(r(("a2", "b1")).getLong(3) ==
      micro(math.log(1) + math.log(4) - math.log(1) - math.log(3)))
    // perfectly independent uniform 2x2 -> pmi 0 everywhere
    val ind = Seq(("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"))
      .toDF("x", "y")
    assert(Relational.pmiTable(ind, "x", "y").collect()
      .forall(_.getLong(3) == 0L))
  }

  test("kAnonymityViolations: only the under-k groups surface") {
    val rows = Seq.fill(7)(("g1", "t")) ++ Seq.fill(3)(("g2", "t")) ++
      Seq(("g3", "u"))
    val out = Relational.kAnonymityViolations(
      rows.toDF("q1", "q2"), Seq("q1", "q2"), k = 5)
      .collect().map(v => (v.getString(0), v.getLong(2))).toMap
    assert(out == Map("g2" -> 3L, "g3" -> 1L))
  }
}
