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

  test("rougeN: clipped multiset overlap, and a reference shorter than " +
      "n yields null recall") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d x"),
      (3L, "x y x y x y"), (4L, "x y"),
      (5L, "hello")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (1L, 5L))
      .toDF("a_id", "b_id")
    val out = graft.llm.Eval.rougeN(docs, pairs, "doc_id", "text",
      "a_id", "b_id", n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double])))).toMap
    // bigrams of 1: {a b, b c, c d, d e}; of 2: {a b, b c, c d, d x}
    assert(out((1L, 2L)) == ((4L, 4L, 3L,
      Some(0.75), Some(0.75), Some(0.75))))
    // doc 3 bigrams: [x y, y x, x y, y x, x y]; doc 4: [x y]
    // clipped overlap = min(3, 1) = 1
    assert(out((3L, 4L)) == ((5L, 1L, 1L,
      Some(0.2), Some(1.0), Some(math.rint(2 * 0.2 * 1.0 / 1.2 * 1e6)
        / 1e6))))
    // doc 5 has a single token -> zero bigrams -> null r and f1
    val (na, nb, no, p, r, f1) = out((1L, 5L))
    assert(nb == 0L && no == 0L && r.isEmpty && f1.isEmpty)
    assert(na == 4L && p == Some(0.0))
  }

  test("welchTTest: hand samples match the driver-side Welch formulas; " +
      "a sample below two rows yields nulls") {
    val rows = Seq(("g", 1.0, true), ("g", 2.0, true), ("g", 3.0, true),
      ("g", 2.0, false), ("g", 4.0, false), ("g", 6.0, false),
      ("g", 8.0, false),
      ("h", 1.0, true), ("h", 2.0, false), ("h", 3.0, false))
    val out = Relational.welchTTest(rows.toDF("grp", "x", "f"),
      Seq("grp"), "x", col("f")).collect()
      .map(r => r.getString(0) -> r).toMap
    val g = out("g")
    // A = [1,2,3]: m1=2, v1=1; B = [2,4,6,8]: m2=5, v2=20/3
    val v1 = 1.0; val v2 = 20.0 / 3.0
    val se2 = v1 / 3 + v2 / 4
    val t = (2.0 - 5.0) / math.sqrt(se2)
    val dfW = se2 * se2 / ((v1 / 3) * (v1 / 3) / 2 +
      (v2 / 4) * (v2 / 4) / 3)
    assert(g.getLong(1) == 3 && g.getLong(2) == 4)
    assert(math.abs(g.getDouble(5) - t) < 1e-5, "t statistic")
    assert(math.abs(g.getDouble(6) - dfW) < 1e-5, "Welch df")
    val h = out("h")
    assert(h.isNullAt(5) && h.isNullAt(6), "degenerate sample -> nulls")
  }

  test("kaplanMeier: the classic hand trace — risk sets, censoring, " +
      "and the left-folded survival product") {
    val subj = Seq(("g", 1, 1), ("g", 1, 0), ("g", 2, 1), ("g", 3, 0),
      ("g", 3, 1)).toDF("grp", "step", "event")
    val out = Relational.kaplanMeier(subj, Seq("grp"), "step", "event")
      .collect().map(r => r.getInt(1) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out(1) == ((5L, 1L, 0.8, 0.8)))
    assert(out(2) == ((3L, 1L, 0.666667, 0.533334)),
      "survival folds the ROUNDED factors in step order")
    assert(out(3) == ((2L, 1L, 0.5, 0.266667)))
  }

  test("anovaF: separated groups give the textbook F; identical groups " +
      "give ssw 0 and a null F") {
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)))
      .toDF("grp", "x")
    val r = Relational.anovaF(df, "grp", "x").collect().head
    assert(r.getInt(0) == 2 && r.getLong(1) == 6)
    assert(math.abs(r.getDouble(2) - 13.5) < 1e-9, "SSB")
    assert(math.abs(r.getDouble(3) - 4.0) < 1e-9, "SSW")
    assert(math.abs(r.getDouble(4) - 13.5) < 1e-9, "F = (13.5/1)/(4/4)")
    val c = Seq(("a", 2), ("a", 2), ("b", 2), ("b", 2)).toDF("grp", "x")
    val rc = Relational.anovaF(c, "grp", "x").collect().head
    assert(rc.getDouble(3) == 0.0 && rc.isNullAt(4),
      "zero within-variance -> F undefined")
  }

  test("cmsJoinSize: exact F(A,B) is the true join size; the sketch " +
      "estimate is a one-sided overestimate, exact at low load") {
    import graft.engine.Sketches
    val a = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq("k3"))
      .map(Tuple1(_)).toDF("ka")
    val b = (Seq.fill(4)("k1") ++ Seq("k2") ++ Seq.fill(5)("zz"))
      .map(Tuple1(_)).toDF("kb")
    val r = Sketches.cmsJoinSize(a, "ka", b, "kb", d = 4, w = 1024)
      .collect().head
    // exact = 3*4 (k1) + 2*1 (k2) + 0 (k3/zz) = 14
    assert(r.getLong(3) == 14L, "exact join size")
    assert(r.getLong(2) >= r.getLong(3), "CMS never underestimates")
    assert(r.getLong(2) == 14L,
      "4 keys in 1024 buckets x 4 rows: some row is collision-free")
    // disjoint key sets -> exact 0, err_ppm null (guarded division)
    val dA = Seq("x1", "x2").map(Tuple1(_)).toDF("ka")
    val dB = Seq("y1", "y2").map(Tuple1(_)).toDF("kb")
    val rd = Sketches.cmsJoinSize(dA, "ka", dB, "kb", d = 4, w = 1024)
      .collect().head
    assert(rd.getLong(3) == 0L && rd.isNullAt(4))
  }

  test("cmsJoinSize: an empty side yields est=0 / exact=0 (rows with " +
      "no shared buckets contribute ip=0, not a dropped row)") {
    import graft.engine.Sketches
    val a = Seq("k1", "k1", "k2").map(Tuple1(_)).toDF("ka")
    val e = spark.emptyDataset[String].toDF("kb")
    val r = Sketches.cmsJoinSize(a, "ka", e, "kb", d = 4, w = 256)
      .collect().head
    assert(r.getLong(2) == 0L, "est must be 0 on an empty side, " +
      "not NULL from a min over zero surviving rows")
    assert(r.getLong(3) == 0L && r.isNullAt(4))
  }

  test("neymanAllocation: allocations follow n_h*sigma_h with largest-" +
      "remainder seats and always sum to the budget") {
    import graft.llm.Selection
    // exact shares: weights 2 (a: sd 1) vs 6 (b: sd 3), budget 4 -> 1/3
    val ex = Seq(("a", 0.0), ("a", 2.0), ("b", 0.0), ("b", 6.0))
      .toDF("st", "x")
    val got = Selection.neymanAllocation(ex, "st", "x", budget = 4L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got == Map("a" -> 1L, "b" -> 3L))
    // remainders: weights 1/2/4 over budget 10 -> bases 1/2/5,
    // remainders .428/.857/.714 -> the two seats go to b then c
    val lr = Seq(("a", 0.0), ("a", 1.0), ("b", 0.0), ("b", 2.0),
      ("c", 0.0), ("c", 4.0)).toDF("st", "x")
    val got2 = Selection.neymanAllocation(lr, "st", "x", budget = 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got2 == Map("a" -> 1L, "b" -> 3L, "c" -> 6L))
    assert(got2.values.sum == 10L, "seats sum exactly to the budget")
    // all-constant strata: zero weights everywhere still deals the
    // full budget (deterministically, to the name-ordered strata)
    val const = Seq(("a", 5.0), ("b", 5.0)).toDF("st", "x")
    val got3 = Selection.neymanAllocation(const, "st", "x", budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got3.values.sum == 3L && got3("a") >= got3("b"))
  }

  test("trimmedMean: rank cuts drop the k smallest/largest values; " +
      "ties across the cut cannot change the kept multiset") {
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "x")
    val r = Relational.trimmedMean(df, Seq("grp"), "x", trimPct = 10)
      .collect().head
    assert(r.getLong(1) == 10 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 5.5, "mean of 2..9")
    val ties = Seq(("g", 1.0), ("g", 1.0), ("g", 1.0), ("g", 9.0))
      .toDF("grp", "x")
    val rt = Relational.trimmedMean(ties, Seq("grp"), "x", trimPct = 25)
      .collect().head
    assert(rt.getDouble(3) == 1.0, "kept {1,1} regardless of tie order")
  }

  test("modularity: two triangles joined by a bridge, communities = " +
      "triangles -> the textbook contributions") {
    val e = Seq(("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
      ("b1", "b2"), ("b2", "b3"), ("b1", "b3"), ("a3", "b1"))
      .toDF("u", "v")
    val asg = Seq(("a1", "A"), ("a2", "A"), ("a3", "A"),
      ("b1", "B"), ("b2", "B"), ("b3", "B")).toDF("node", "comm")
    val out = graft.engine.Graph.modularity(e, "u", "v", asg, "node",
      "comm").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    // m = 7; each community: e_in = 3, deg_sum = 2+2+3 = 7
    // q_c = 3/7 - (7/14)^2 = 0.428571... - 0.25 = 0.178571
    assert(out("A") == ((3L, 3L, 7L, 0.178571)))
    assert(out("B") == ((3L, 3L, 7L, 0.178571)))
  }

  test("degreeAssortativity: a star is perfectly disassortative " +
      "(r = -1); a cycle is degree-regular (null r)") {
    val star = Seq(("c", "l1"), ("c", "l2"), ("c", "l3")).toDF("u", "v")
    val rs = graft.engine.Graph.degreeAssortativity(star, "u", "v")
      .collect().head
    assert(rs.getLong(0) == 3 && rs.getDouble(1) == -1.0)
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("u", "v")
    val rc = graft.engine.Graph.degreeAssortativity(cycle, "u", "v")
      .collect().head
    assert(rc.getLong(0) == 3 && rc.isNullAt(1),
      "zero degree variance -> undefined correlation")
  }

  test("quantileNormalize: shifted sources land on the pooled scale " +
      "at matching quantile positions") {
    val df = ((1 to 4).map(i => ("a", i.toLong, i.toDouble)) ++
      (101 to 104).map(i => ("b", i.toLong, i.toDouble)))
      .toDF("src", "id", "x")
    val out = Relational.quantileNormalize(df, "src", "id", "x",
      nBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getInt(3), r.getDouble(4)))).toMap
    // pooled ntile(4) buckets of [1,2,3,4,101,102,103,104]:
    // maxes 2, 4, 102, 104; each source's rank r of 4 -> bucket r
    assert(out(("a", 1L)) == ((1, 2.0)))
    assert(out(("a", 4L)) == ((4, 104.0)),
      "source a's top value maps to the pooled top bucket")
    assert(out(("b", 101L)) == ((1, 2.0)),
      "source b's bottom value maps to the pooled bottom bucket")
    assert(out(("b", 104L)) == ((4, 104.0)))
  }

  test("ols2: recovers an exact plane (r2 = 1); collinear features " +
      "yield null coefficients") {
    val pts = Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0), (1.0, 1.0),
      (2.0, 1.0), (1.0, 2.0))
      .map { case (x1, x2) => ("g", 2.0 + 3.0 * x1 - x2, x1, x2) }
    val r = Relational.ols2(pts.toDF("grp", "y", "x1", "x2"),
      Seq("grp"), "y", "x1", "x2").collect().head
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == -1.0)
    assert(r.getDouble(4) == 2.0 && r.getDouble(5) == 1.0)
    val colinear = Seq(1.0, 2.0, 3.0, 4.0)
      .map(x => ("g", 2.0 * x, x, x))
    val rc = Relational.ols2(colinear.toDF("grp", "y", "x1", "x2"),
      Seq("grp"), "y", "x1", "x2").collect().head
    assert(rc.isNullAt(2) && rc.isNullAt(3),
      "singular design -> null coefficients, not an explosion")
  }

  test("conformalQuantile: the (n+1)(1-alpha) rank pick, null when the " +
      "guarantee needs the infinite quantile") {
    import graft.llm.Eval
    val df = (1 to 19).map(i => ("g", i.toDouble)).toDF("grp", "s")
    val r = Eval.conformalQuantile(df, Seq("grp"), "s", alphaPct = 10)
      .collect().head
    // ceil(20 * 0.9) = 18 -> the 18th smallest of 1..19
    assert(r.getLong(1) == 19 && r.getLong(2) == 18)
    assert(r.getDouble(3) == 18.0)
    val tiny = Seq(("g", 1.0), ("g", 2.0)).toDF("grp", "s")
    val rt = Eval.conformalQuantile(tiny, Seq("grp"), "s", alphaPct = 10)
      .collect().head
    assert(rt.getLong(2) == 3 && rt.isNullAt(3),
      "rank beyond n -> infinite quantile -> null")
  }

  test("bhFdr: the textbook step-up — discoveries up to the largest " +
      "rank whose p clears its criterion, including worse ranks below") {
    // m = 5, alpha = 25%: crits 0.05 0.10 0.15 0.20 0.25
    // ps: 0.01 0.04 0.16 0.18 0.9 -> ranks 3 (0.16>0.15) fails but
    // rank 4 (0.18 <= 0.20) passes -> kstar = 4, discoveries 1..4
    val df = Seq(("a", 0.01), ("b", 0.04), ("c", 0.16), ("d", 0.18),
      ("e", 0.9)).toDF("id", "p")
    val out = Relational.bhFdr(df, "id", "p", alphaPct = 25)
      .collect().map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(out == Map("a" -> true, "b" -> true, "c" -> true,
      "d" -> true, "e" -> false),
      "step-up rescues rank 3 via rank 4's pass")
  }

  test("negativeEdgeSamples: no sampled pair is a real edge or a self " +
      "loop, draws are deterministic, at most k per node") {
    import graft.engine.Graph
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "a")).toDF("u", "v")
    val out = Graph.negativeEdgeSamples(e, "u", "v", k = 2,
      oversample = 6).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val edges = Set(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("e", "a")).flatMap { case (x, y) => Set((x, y), (y, x)) }
    out.foreach { case (u, _, neg) =>
      assert(u != neg, "no self loops")
      assert(!edges.contains((u, neg)), s"($u,$neg) is a real edge")
    }
    assert(out.groupBy(_._1).values.forall(_.length <= 2), "<= k rows")
    val out2 = Graph.negativeEdgeSamples(e, "u", "v", k = 2,
      oversample = 6).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(out.sorted.toSeq == out2.sorted.toSeq, "seedless rerun")
  }

  test("kfoldAssign: per-stratum fold sizes differ by at most one and " +
      "the deal is partition-invariant") {
    import graft.llm.Selection
    val df = ((1 to 23).map(i => (i.toLong, "x")) ++
      (100 to 104).map(i => (i.toLong, "y"))).toDF("id", "st")
    val out = Selection.kfoldAssign(df, "st", "id", k = 5)
      .collect().map(r => (r.getString(1), r.getInt(2)))
    val sizes = out.groupBy(identity).view.mapValues(_.size).toMap
    val xs = (0 until 5).map(f => sizes.getOrElse(("x", f), 0))
    assert(xs.max - xs.min <= 1, s"x strata balanced: $xs")
    assert(xs.sum == 23)
    val ys = (0 until 5).map(f => sizes.getOrElse(("y", f), 0))
    assert(ys.max - ys.min <= 1 && ys.sum == 5)
    val again = Selection.kfoldAssign(df.repartition(7), "st", "id", 5)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    val first = Selection.kfoldAssign(df, "st", "id", 5)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(again == first, "hash-order deal survives repartitioning")
  }

  test("jaroWinkler: matches DuckDB's built-in on the probe set — " +
      "prefix boost, 0.7 threshold, floored transpositions, empties") {
    import graft.functions.JaroWinkler.jaroWinkler
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111), // prefix-3 boost
      ("dwayne", "duane", 0.8400000000000001), // prefix-1 boost
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abcdef", "bcadef", 0.9444444444444445), // odd k -> t = k DIV 2
      ("abcdef", "abzzzz", 0.5555555555555555), // below 0.7: no boost
      ("", "", 0.0), ("", "a", 0.0), ("a", "a", 1.0),
      ("CRAPO", "RAPOC", 0.8666666666666667))
    val got = cases.zipWithIndex
      .map { case ((a, b, _), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      assert(math.abs(got(i) - want) < 1e-12, s"jw($a, $b)")
    }
  }

  test("jaroWinkler plan carries the native expression and the stats " +
      "family is partition-invariant") {
    import graft.functions.JaroWinkler.jaroWinkler
    // plan pin: parquet-backed input so ConvertToLocalRelation can't
    // pre-evaluate the projection away
    val docs = Queries.T(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name"))
    val plan = docs.select(jaroWinkler(col("p_name"), col("p_name")))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("jaro_winkler"), s"native expr missing:\n$plan")
    // partition invariance: exact-decimal state makes outputs
    // independent of physical layout for the whole stats family
    val rnd = new scala.util.Random(17)
    val data = (1 to 500).map(i =>
      (s"g${i % 3}", rnd.nextInt(1000).toDouble, i % 2 == 0, s"id$i"))
      .toDF("grp", "x", "f", "rid")
    def fp(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    Seq(1, 13).map(n => data.repartition(n)) match {
      case Seq(a, b) =>
        assert(fp(Relational.welchTTest(a, Seq("grp"), "x", col("f"))) ==
          fp(Relational.welchTTest(b, Seq("grp"), "x", col("f"))))
        assert(fp(Relational.anovaF(a, "grp", "x")) ==
          fp(Relational.anovaF(b, "grp", "x")))
        assert(fp(Relational.trimmedMean(a, Seq("grp"), "x", 5)) ==
          fp(Relational.trimmedMean(b, Seq("grp"), "x", 5)))
        assert(fp(Relational.ols2(a.withColumn("y",
            col("x") * 2 + 1), Seq("grp"), "y", "x", "x")) ==
          fp(Relational.ols2(b.withColumn("y", col("x") * 2 + 1),
            Seq("grp"), "y", "x", "x")))
    }
  }

  test("multiTouchAttribution: equal ppm split with the remainder on " +
      "the latest touch; out-of-window touches excluded") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, 10L, t(40), "click"), (1L, 11L, t(80), "view"),
      (1L, 12L, t(90), "click"), (1L, 13L, t(100), "purchase"),
      (1L, 14L, t(100), "click"), // not strictly before -> excluded
      (2L, 20L, t(5), "click"), (2L, 21L, t(500), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = graft.engine.Windows.multiTouchAttribution(ev, "user_id",
      "event_id", "ts", "event_type", "purchase",
      Seq("click", "view"), windowSec = 100L)
      .collect().map(r => r.getLong(3) -> r.getLong(6)).toMap
    assert(out == Map(10L -> 333333L, 11L -> 333333L, 12L -> 333334L),
      "remainder ppm lands on the latest touch; same-instant and " +
        "out-of-window touches excluded (user 2's touch is 495s prior)")
  }

  test("maxConcurrency: sweep peak with ends-before-starts at shared " +
      "instants (touching intervals do not overlap)") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val iv = Seq(("g", t(0), t(10)), ("g", t(5), t(15)),
      ("g", t(10), t(20))).toDF("k", "s", "e")
    val r = graft.engine.Windows.maxConcurrency(iv, Seq("k"), "s", "e")
      .collect().head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getTimestamp(3) == t(5),
      "peak of 2 is first attained at t=5; the touch at t=10 is not 3")
  }

  test("intraListDiversity: duplicate items drag ILD down; coverage " +
      "counts distinct recommended over the catalog") {
    import graft.llm.Eval
    val items = Seq((1L, v(1, 0)), (2L, v(1, 0)), (3L, v(0, 1)),
      (4L, v(0.5, 0.5))).toDF("id", "vec")
    val lists = Seq((100L, 1L), (100L, 2L), (100L, 3L))
      .toDF("q", "item")
    val r = Eval.intraListDiversity(lists, "q", "item", items, "id",
      "vec").collect().head
    assert(r.getInt(1) == 3)
    // pairs: (1,2) d=0, (1,3) d=1, (2,3) d=1 -> ild = 2/3
    assert(math.abs(r.getDouble(2) - 2.0 / 3.0) < 1e-6)
    assert(r.getLong(3) == 750000L, "3 of 4 catalog items recommended")
  }

  test("changepoint: a clean kink is found exactly — zero split RMSE, " +
      "positive gain, split at the last left point") {
    val pts = (0 until 10).map(t => ("g", t, t.toDouble)) ++
      (10 until 20).map(t => ("g", t, 10.0 + 5.0 * (t - 10)))
    val r = graft.engine.Windows.changepoint(pts.toDF("grp", "t", "y"),
      Seq("grp"), "t", "y").collect().head
    assert(r.getLong(1) == 20)
    assert(r.getDouble(2) == 9.0, "split after the last pre-kink point")
    assert(r.getDouble(3) == 0.0, "both segments fit exactly")
    assert(r.getDouble(4) > 0 && r.getDouble(5) == r.getDouble(4),
      "gain is the whole single-fit RMSE")
    // a perfectly linear series: no split beats the single fit by much
    val lin = (0 until 20).map(t => ("g", t, 3.0 * t + 1))
    val rl = graft.engine.Windows.changepoint(lin.toDF("grp", "t", "y"),
      Seq("grp"), "t", "y").collect().head
    assert(rl.getDouble(5) == 0.0, "linear data -> zero gain")
  }

  test("riAudit: orphan counts and ppm per declared edge") {
    val child = Seq(Some(1L), Some(2L), Some(3L), Some(99L), None)
      .map(Tuple1(_)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("pk")
    val r = Relational.riAudit(Seq(("e1", child, "fk", parent, "pk")))
      .collect().head
    assert(r.getString(0) == "e1")
    assert(r.getLong(1) == 4, "null FKs excluded from the child count")
    assert(r.getLong(2) == 1, "the 99 is the one orphan")
    assert(r.getLong(3) == 250000L)
  }

  test("funnelStepLatency: exact-rank dwell percentiles per step pair") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    // three users converting view->click with deltas 10, 20, 90
    val ev = Seq(
      (1L, t(0), "view"), (1L, t(10), "click"),
      (2L, t(0), "view"), (2L, t(20), "click"),
      (3L, t(0), "view"), (3L, t(90), "click"),
      (4L, t(0), "view")) // never clicks
      .toDF("user_id", "ts", "event_type")
    val r = graft.engine.Windows.funnelStepLatency(ev, "user_id", "ts",
      "event_type", Seq("view", "click"))
      .collect().head
    assert(r.getInt(0) == 2 && r.getString(1) == "view" &&
      r.getString(2) == "click")
    assert(r.getLong(3) == 3)
    assert(r.getLong(4) == 10 && r.getLong(5) == 20 &&
      r.getLong(6) == 90 && r.getLong(7) == 90,
      "min/lower-median/p90/max over {10,20,90}")
  }

  test("weightedSampleTopK: matches a driver-side A-ES model, excludes " +
      "non-positive weights, and is partition-invariant") {
    import graft.llm.Shaping
    val rows = (1 to 60).map(i => (i.toLong, "g",
      if (i <= 5) 50.0 else if (i <= 10) 0.0 else 0.5))
    val df = rows.toDF("id", "grp", "w")
    def model: Seq[Long] = {
      def ph(s: String) = s.foldLeft(0L)((a, c) => (a * 31 + c) %
        1000000007L)
      rows.filter(_._3 > 0).map { case (id, _, w) =>
        val u = (ph(s"$id:s1") * 2654435761L % 1000000007L + 1)
          .toDouble / 1000000008.0
        val key = BigDecimal(math.log(u) / w)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, key)
      }.sortBy { case (id, k) => (-k, id) }.take(8).map(_._1)
    }
    val got = Shaping.weightedSampleTopK(df, "id", col("w"), k = 8,
      groupCols = Seq("grp"))
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(got == model, "operator matches the A-ES reference model")
    assert(!got.exists(id => id > 5 && id <= 10),
      "zero-weight rows can never be sampled")
    val again = Shaping.weightedSampleTopK(df.repartition(7), "id",
      col("w"), 8, Seq("grp"))
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(again == got)
  }

  test("lshTuningCurve: golden point and monotonicity in s") {
    import graft.llm.Dedup
    val t = Dedup.lshTuningCurve(spark, Seq(2), Seq(4), stepPct = 5)
      .collect().map(r => r.getDouble(2) -> r.getDouble(3)).toMap
    // r=2, b=4, s=0.5: 1 - (1 - 0.25)^4 = 0.68359375
    assert(t(0.5) == 0.683594)
    val sorted = t.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted, "candidate probability rises with s")
    assert(t(0.05) < 0.01 && t(0.95) > 0.99,
      "the S-curve pins both tails")
  }

  test("rollingCorr: full windows of exact co-movement give +/-1; the " +
      "warm-up prefix is null") {
    val up = (1 to 30).map(i => ("g", i, i.toDouble, 2.0 * i + 3))
    val r1 = graft.engine.Windows.rollingCorr(
      up.toDF("grp", "t", "x", "y"), Seq("grp"), Seq("t"), "x", "y",
      n = 10).orderBy(col("t")).collect()
    assert((0 until 9).forall(r1(_).isNullAt(4)), "warm-up nulls")
    assert((9 until 30).forall(r1(_).getDouble(4) == 1.0))
    val down = (1 to 15).map(i => ("g", i, i.toDouble, -3.0 * i))
    val r2 = graft.engine.Windows.rollingCorr(
      down.toDF("grp", "t", "x", "y"), Seq("grp"), Seq("t"), "x", "y",
      n = 10).orderBy(col("t")).collect()
    assert(r2.last.getDouble(4) == -1.0)
  }

  test("modePerGroup: most frequent value wins, ties to the smaller") {
    val df = Seq(("g", 3), ("g", 3), ("g", 1), ("g", 1), ("g", 2),
      ("h", 9)).toDF("grp", "x")
    val out = Relational.modePerGroup(df, Seq("grp"), "x")
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2)))).toMap
    assert(out("g") == ((1, 2L)), "tie between 1 and 3 -> smaller value")
    assert(out("h") == ((9, 1L)))
  }

  test("profileDiff: exact counts/null shares and a hand mean/std " +
      "delta") {
    val a = Seq(Some(1.0), Some(2.0), Some(3.0), None)
      .map(Tuple1(_)).toDF("x")
    val b = Seq(Some(5.0), Some(7.0)).map(Tuple1(_)).toDF("x")
    val r = Relational.profileDiff(a, b, Seq("x")).collect().head
    assert(r.getLong(1) == 4 && r.getLong(2) == 2)
    assert(r.getLong(3) == 250000L && r.getLong(4) == 0L)
    assert(r.getDouble(5) == 2.0 && r.getDouble(6) == 6.0)
    assert(r.getDouble(7) == 4.0, "mean delta")
    // population std: a over {1,2,3} -> sqrt(2/3); b over {5,7} -> 1
    assert(math.abs(r.getDouble(8) - math.sqrt(2.0 / 3.0)) < 1e-6)
    assert(r.getDouble(9) == 1.0)
  }
}
