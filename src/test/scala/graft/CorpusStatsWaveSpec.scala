package graft

import graft.llm.Curation

/** Hand-value pins for the q341-q343 wave: Good-Turing spectrum,
  * Chao1 richness, vocab budget.
  */
class CorpusStatsWaveSpec extends SparkSpec {
  import spark.implicits._

  // counts: a:3 b:2 c:2 d:2 e:1 f:1 -> N=11, V=6, n1=2, n2=3
  private val docs = Seq("a a a b b c d", "c d e", "f").toDF("text")

  test("goodTuringSpectrum: hand frequencies-of-frequencies and " +
      "Turing-adjusted counts; truncated tail adjusts to zero") {
    val r = Curation.goodTuringSpectrum(docs.repartition(2), "text",
        maxR = 4)
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r(1).getLong(1) == 2 && r(2).getLong(1) == 3 &&
      r(3).getLong(1) == 1 && r(4).getLong(1) == 0)
    // r=1: 2*N2/N1 = 3; r=2: 3*N3/N2 = 1; r=3: 4*N4/N3 = 0
    assert(r(1).getLong(2) == 3000000L)
    assert(r(2).getLong(2) == 1000000L)
    assert(r(3).getLong(2) == 0L)
    assert(r(4).isNullAt(2), "N_4 = 0 -> undefined adjustment")
  }

  test("chao1Richness: hand singleton/doubleton estimate and unseen " +
      "mass") {
    val r = Curation.chao1Richness(docs, "text").collect().head
    assert(r.getLong(0) == 11 && r.getLong(1) == 6)
    assert(r.getLong(2) == 2 && r.getLong(3) == 3)
    // 6e6 + (2*1*1e6)//(2*4) = 6250000; p0 = 2e6//11 = 181818
    assert(r.getLong(4) == 6250000L)
    assert(r.getLong(5) == 181818L)
  }

  test("vocabBudget: smallest covering prefix per percentage, " +
      "frequency-then-lexico order") {
    val r = Curation.vocabBudget(docs.repartition(3), "text",
        Seq(50, 100))
      .collect().map(x => x.getInt(0) -> x).toMap
    // cum masses: a 3, +b 5, +c 7, +d 9, +e 10, +f 11 (N = 11)
    assert(r(50).getLong(1) == 3 && r(50).getLong(2) == 7)
    assert(r(100).getLong(1) == 6 && r(100).getLong(2) == 11)
  }
}
