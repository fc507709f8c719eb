package graft

import org.apache.spark.sql.functions._
import graft.engine.{Graph, Relational}
import graft.llm.{Curation, Similarity}

/** Audit/eval wave: k-anonymity, Poisson-bootstrap CI, HITS, MMR rerank.
  * Hand-model goldens where the arithmetic is exact, plus the invariants
  * the oracle hash can't see (partition invariance, CI bracketing,
  * diversity-over-relevance behavior).
  */
class AuditWaveSpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Double*) = xs.toArray

  test("kAnonymityAudit: hand classes give the exact k/l report") {
    // classes: (1,x)×3 rows, (2,y)×10 rows, (3,z)×1 row
    val rows = Seq.fill(3)((1, "x")) ++ Seq.fill(10)((2, "y")) ++
      Seq((3, "z"))
    val df = rows.zipWithIndex
      .map { case ((q, s), i) => (q, s, if (q == 2) i % 2 else i) }
      .toDF("qi1", "qi2", "sens")
    val r = Curation.kAnonymityAudit(df, Seq("qi1", "qi2"), "sens", k = 5)
      .collect().head
    assert(r.getInt(0) == 5)
    assert(r.getLong(1) == 14, "n_rows")
    assert(r.getLong(2) == 3, "n_classes")
    assert(r.getLong(3) == 1, "k_min: the singleton class")
    assert(r.getLong(4) == 2, "classes below k=5: sizes 3 and 1")
    assert(r.getLong(5) == 4, "rows at risk: 3 + 1")
    assert(r.getLong(6) == 4L * 1000000 / 14, "risk_ppm")
    // the 10-row class cycles sens through only 2 values -> l_min 2
    // (3-row class has 3 distinct, singleton has 1 -> l_min = 1)
    assert(r.getLong(7) == 1, "l_min: the singleton class")
  }

  test("bootstrapMeanCI: exact point mean, CI brackets it, constant " +
      "column collapses the CI, and the pick is partition-invariant") {
    val rnd = new scala.util.Random(3)
    val xs = (1 to 400).map(i => ("g", s"id$i", 50.0 + rnd.nextInt(100)))
    val df = xs.toDF("grp", "rid", "x")
    val r = Relational.bootstrapMeanCI(df, Seq("grp"), "x", "rid", b = 40)
      .collect().head
    val exactMean = xs.map(_._3).sum / xs.size
    assert(r.getLong(1) == 400)
    assert(math.abs(r.getDouble(2) - exactMean) < 1e-6, "exact point mean")
    assert(r.getDouble(3) <= r.getDouble(2) &&
      r.getDouble(2) <= r.getDouble(4), "CI brackets the mean")
    assert(r.getInt(5) == 40, "all resamples non-degenerate")
    // partition invariance: integer weights + decimal sums
    val r7 = Relational.bootstrapMeanCI(df.repartition(7), Seq("grp"),
      "x", "rid", b = 40).collect().head
    assert(r.getDouble(3) == r7.getDouble(3) &&
      r.getDouble(4) == r7.getDouble(4))
    // constant column: every resample mean IS the constant
    val c = (1 to 50).map(i => ("g", s"id$i", 7.5)).toDF("grp", "rid", "x")
    val rc = Relational.bootstrapMeanCI(c, Seq("grp"), "x", "rid", b = 40)
      .collect().head
    assert(rc.getDouble(3) == 7.5 && rc.getDouble(4) == 7.5)
  }

  test("hitsPpm: star graph matches the hand-computed 2-round trace") {
    val e = Seq(("s1", "p1"), ("s1", "p2"), ("s1", "p3"), ("s2", "p1"))
      .toDF("src", "dst")
    val out = Graph.hitsPpm(e, "src", "dst", iters = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // round 1: auth raw p1=2e6, p2=p3=1e6 -> p1=1e6, p2=p3=5e5;
    //   hub raw s1=2e6, s2=1e6 -> s1=1e6, s2=5e5
    // round 2: auth raw p1=1.5e6, p2=p3=1e6 -> p1=1e6, p2=p3=666666;
    //   hub raw s1=2333332, s2=1e6 -> s1=1e6, s2=428571
    assert(out("s1") == ((1000000L, 0L)))
    assert(out("s2") == ((428571L, 0L)))
    assert(out("p1") == ((0L, 1000000L)))
    assert(out("p2") == ((0L, 666666L)))
    assert(out("p3") == ((0L, 666666L)))
  }

  test("mmrRerank: the second pick trades relevance for diversity, " +
      "skipping the near-duplicate of the first pick") {
    val corpus = Seq(
      (1L, v(0.9, 0.1, 0.0, 0.0)), // A: most relevant
      (2L, v(0.9, 0.1, 0.001, 0.0)), // A': near-dup of A, 2nd by rel
      (3L, v(0.3, 0.0, 0.95, 0.0))) // B: less relevant, diverse
      .toDF("vec_id", "embedding")
    val queries = Seq((100L, v(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mmrRerank(corpus, queries, "vec_id",
      "embedding", "vec_id", n = 3, m = 2, lambdaPct = 30)
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(out(1) == 1L, "first pick is pure relevance: A")
    assert(out(2) == 3L,
      "second pick is the diverse B, not the near-duplicate A'")
    // control: relevance-only ordering WOULD have picked A' second
    val rel = Similarity.bruteForceTopK(corpus, queries, "vec_id",
      "embedding", "vec_id", 2)
      .collect().map(r => r.getInt(3) -> r.getLong(1)).toMap
    assert(rel(2) == 2L)
  }
}
