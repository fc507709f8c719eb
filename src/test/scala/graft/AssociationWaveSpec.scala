package graft

import org.apache.spark.sql.functions._
import graft.engine.Relational
import graft.llm.Eval

/** Hand-value pins for the q425–q435 association/consistency wave:
  * worked examples where every intermediate (entropy micro terms, pair
  * counts, scaled sums of squares, CUSUM drifts, rational RBP weights)
  * is checked against arithmetic done by hand, plus the boundary
  * behaviors (degenerate variance, incomplete cases, guard trips) the
  * oracle hashes can't isolate.
  */
class AssociationWaveSpec extends SparkSpec {
  import spark.implicits._

  test("mutualInformation: a deterministic 2x2 scores MI = H = ln 2 " +
      "and NMI = 1; an independent 2x2 scores 0") {
    val dep = Seq(("a", 0L), ("a", 0L), ("b", 1L), ("b", 1L))
      .toDF("x", "y")
    val r = Relational.mutualInformation(dep, "x", "y").head()
    // round(ln 2 * 1e6) = 693147; n = 4, every weight 2 (or cell 2)
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("h_x_micro") == 693147L)
    assert(r.getAs[Long]("h_y_micro") == 693147L)
    assert(r.getAs[Long]("mi_micro") == 693147L)
    assert(r.getAs[Double]("nmi") == 1.0)
    val ind = Seq(("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L))
      .toDF("x", "y")
    val ri = Relational.mutualInformation(ind, "x", "y").head()
    assert(ri.getAs[Long]("mi_micro") == 0L)
    assert(ri.getAs[Double]("nmi") == 0.0)
  }

  test("cohensD: two 2-point groups with equal spread give the " +
      "closed-form d and the 1 - 3/(4N-9) Hedges shrink") {
    val df = Seq(("A", 0L), ("A", 2L), ("B", 4L), ("B", 6L))
      .toDF("g", "v")
    val r = Relational.cohensD(df, "g", "v", "A", "B").head()
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("mean_a") == 1.0)
    assert(r.getAs[Double]("mean_b") == 5.0)
    // pooled s^2 = 2 -> d = -4/sqrt(2)
    assert(r.getAs[Double]("d") ==
      math.round(-4.0 / math.sqrt(2.0) * 1e6) / 1e6)
    assert(r.getAs[Double]("g") ==
      math.round(-4.0 / math.sqrt(2.0) * (1.0 - 3.0 / 7.0) * 1e6) / 1e6)
  }

  test("quantileReport: 1..10 reads the ceil(n*q/100)-th order " +
      "statistic at p50/p90/p99") {
    val df = (1L to 10L).map(("g", _)).toDF("grp", "v")
    val r = Relational.quantileReport(df, Seq("grp"), "v",
        Seq(50, 90, 99))
      .collect().map(x => x.getAs[Int]("q_pct") ->
        x.getAs[Long]("x_q")).toMap
    assert(r == Map(50 -> 5L, 90 -> 9L, 99 -> 10L))
  }

  test("concentrationReport: shares 50/30/20 give HHI 380000 ppm and " +
      "CR-2 800000 ppm") {
    val df = Seq(("a", 50L), ("b", 30L), ("c", 20L)).toDF("k", "w")
    val r = Relational.concentrationReport(df, "k", "w", topK = 2)
      .head()
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Long]("w_total") == 100L)
    assert(r.getAs[Long]("hhi_ppm") == 380000L)
    assert(r.getAs[Long]("cr_ppm") == 800000L)
  }

  test("cochranQ: the 3-item worked example reads Q = 3; an " +
      "incomplete block is dropped") {
    val df = Seq(
      (1, "t1", true), (1, "t2", true), (1, "t3", false),
      (2, "t1", true), (2, "t2", false), (2, "t3", false),
      (3, "t1", true), (3, "t2", true), (3, "t3", true),
      (4, "t1", true)) // incomplete: dropped
      .toDF("item", "tr", "s")
    val r = Relational.cochranQ(df, "item", "tr", "s").head()
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Long]("k") == 3L)
    assert(r.getAs[Long]("n_success") == 6L)
    // (k-1)(k*SumC2 - N^2)/(kN - SumR2) = 2*(42-36)/(18-14) = 3
    assert(r.getAs[Double]("q_stat") == 3.0)
  }

  test("somersGamma: a monotone lattice plus one tied-y cell gives " +
      "gamma 1 and D_yx = 5/6; the maxCells guard trips loudly") {
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 3L)).toDF("x", "y")
    val r = Relational.somersGamma(df, "x", "y").head()
    assert(r.getAs[Long]("c_pairs") == 5L)
    assert(r.getAs[Long]("d_pairs") == 0L)
    assert(r.getAs[Long]("ty_pairs") == 1L)
    assert(r.getAs[Double]("gamma") == 1.0)
    assert(r.getAs[Double]("somers_d") == 0.833333)
    val e = intercept[IllegalArgumentException] {
      Relational.somersGamma(df, "x", "y", maxCells = 3)
    }
    assert(e.getMessage.contains("maxCells=3"))
  }

  test("cronbachAlpha: two perfectly correlated items read alpha 1; " +
      "a partial case is dropped from n_subjects") {
    val df = Seq(
      (1, "i1", 1L), (1, "i2", 1L),
      (2, "i1", 2L), (2, "i2", 2L),
      (3, "i1", 3L), (3, "i2", 3L),
      (4, "i1", 9L)) // incomplete: dropped
      .toDF("id", "itm", "v")
    val r = Relational.cronbachAlpha(df, "id", "itm", "v").head()
    assert(r.getAs[Long]("n_subjects") == 3L)
    assert(r.getAs[Long]("k") == 2L)
    assert(r.getAs[Double]("alpha") == 1.0)
  }

  test("iccOneWay: zero within-group variance reads ICC 1 with the " +
      "closed-form MSB") {
    val df = Seq((1, 0L), (1, 0L), (2, 10L), (2, 10L)).toDF("g", "v")
    val r = Relational.iccOneWay(df, "g", "v", k = 2).head()
    assert(r.getAs[Long]("n_groups") == 2L)
    // SSB*kN = 4*400 - 2*400 = 800 -> MSB = 800/(4*2)/1 = 100
    assert(r.getAs[Double]("msb") == 100.0)
    assert(r.getAs[Double]("msw") == 0.0)
    assert(r.getAs[Double]("icc") == 1.0)
  }

  test("cramerVonMises: identical samples read 0; disjoint singletons " +
      "read the closed-form 1/4") {
    val same = Seq(("A", 1L), ("A", 2L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    assert(Relational.cramerVonMises(same, "g", "v", "A", "B")
      .head().getAs[Double]("t_stat") == 0.0)
    val disj = Seq(("A", 1L), ("B", 2L)).toDF("g", "v")
    val r = Relational.cramerVonMises(disj, "g", "v", "A", "B").head()
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 1L)
    assert(r.getAs[Double]("t_stat") == 0.25)
  }

  test("rbpAtK: exact rational 4/5 weights (200000, 160000, ...) pay " +
      "only at relevant ranks; zero-hit queries report 0") {
    val corpus = Seq(
      (0L, Array(1f, 0f), 7),   // query, label 7
      (1L, Array(1f, 0f), 7),   // rank 1, relevant -> 200000
      (2L, Array(0.9f, 0.1f), 5), // rank 2, not relevant
      (3L, Array(0.8f, 0.2f), 7), // rank 3, relevant -> 128000
      (10L, Array(0f, 1f), 9)   // query, label 9: nothing relevant
    ).toDF("vec_id", "embedding", "label")
    val q = corpus.filter(col("vec_id") === 0L || col("vec_id") === 10L)
    val r = Eval.rbpAtK(corpus, q, "vec_id", "embedding", "label",
        "vec_id", k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Long]("n_rel_topk") == 2L)
    assert(r(0L).getAs[Long]("rbp_micro") == 328000L)
    assert(r(10L).getAs[Long]("rbp_micro") == 0L)
  }

  test("cusumMeanShift: a clean level shift puts the change point at " +
      "the boundary with the exact scaled drift") {
    val df = Seq((1L, 10L, 0L), (2L, 11L, 0L), (3L, 12L, 10L),
      (4L, 13L, 10L)).toDF("t", "eid", "x")
    val r = Relational.cusumMeanShift(df, "t", "x", Seq("eid")).head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("s_total") == 20L)
    assert(r.getAs[Long]("t_star") == 2L)
    assert(r.getAs[Long]("i_star") == 2L)
    assert(r.getAs[Long]("cum_star") == 0L)
    // |n*C - S*i| = |0 - 40| = 40 -> 40/16
    assert(r.getAs[Double]("d_stat") == 2.5)
  }

  test("lexicalRichness: the aaabbc spectrum reads the closed-form " +
      "TTR/Simpson/Yule/Herdan") {
    val df = Seq("a a a b b c").toDF("text")
    val r = graft.llm.Lexical.lexicalRichness(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_types") == 3L)
    assert(r.getAs[Long]("ttr_ppm") == 500000L)
    // S2 = 9+4+1 = 14 -> D = (14-6)/30
    assert(r.getAs[Long]("simpson_micro") == 266666L)
    assert(r.getAs[Double]("yules_k") ==
      math.round(8.0 * 1e4 / 36 * 1e6) / 1e6)
    assert(r.getAs[Double]("herdan_c") ==
      math.round(math.log(3.0) / math.log(6.0) * 1e6) / 1e6)
  }

  test("rakeKeywords: stopword runs segment phrases; deg/freq word " +
      "scores sum per phrase") {
    val df = Seq((1L, "the quick fox and quick dog")).toDF("id", "text")
    val r = graft.llm.Lexical.rakeKeywords(df, "id", "text",
        Seq("the", "and"), topK = 5)
      .collect().map(x => x.getString(0) -> x).toMap
    // quick: freq 2, deg 4 -> 2e6; fox/dog: freq 1, deg 2 -> 2e6
    assert(r.keySet == Set("quick fox", "quick dog"))
    assert(r("quick fox").getAs[Long]("score_micro") == 4000000L)
    assert(r("quick dog").getAs[Long]("n_occurrences") == 1L)
  }

  test("qiniCurve: empty cumulative control arm reads NULL; a " +
      "control-ahead prefix reads the exact negative uplift") {
    val df = Seq((4L, true, true, 1L), (3L, false, true, 2L),
      (2L, true, false, 3L), (1L, false, false, 4L))
      .toDF("sc", "tr", "resp", "eid")
    val r = Relational.qiniCurve(df, "sc", "tr", "resp", Seq("eid"))
      .collect().map(x => x.getAs[Int]("decile") -> x).toMap
    assert(r.keySet == Set(1, 3, 6, 8))
    assert(r(1).isNullAt(r(1).fieldIndex("qini_micro")))
    // at decile 6: cumT=2/respT=1, cumC=1/respC=1 -> 1e6*(1*1-1*2)/1
    assert(r(6).getAs[Long]("qini_micro") == -1000000L)
    assert(r(8).getAs[Long]("qini_micro") == 0L)
  }

  test("linearAttribution: credit splits 1e6 per converting user with " +
      "the floor remainder on the first touch; first/last counts") {
    val df = Seq(
      (1L, 1L, "view"), (1L, 2L, "click"), (1L, 3L, "buy"),
      (1L, 4L, "click"), // post-conversion: ignored
      (2L, 1L, "click"), (2L, 2L, "buy"),
      (3L, 1L, "buy"), // no touches
      (4L, 1L, "a"), (4L, 2L, "b"), (4L, 3L, "c"), (4L, 4L, "buy"))
      .toDF("u", "t", "ty")
    val r = graft.engine.Windows.linearAttribution(df, "u", "t", "ty",
        "buy", Seq("t"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("view").getAs[Long]("credit_micro") == 500000L)
    assert(r("view").getAs[Long]("n_first") == 1L)
    assert(r("click").getAs[Long]("n_touches") == 2L)
    assert(r("click").getAs[Long]("n_last") == 2L)
    assert(r("click").getAs[Long]("credit_micro") == 1500000L)
    // user 4: 1e6 DIV 3 = 333333; remainder +1 to first touch 'a'
    assert(r("a").getAs[Long]("credit_micro") == 333334L)
    assert(r("b").getAs[Long]("credit_micro") == 333333L)
    assert(Seq("view", "click", "a", "b", "c")
      .map(k => r(k).getAs[Long]("credit_micro")).sum == 3000000L)
  }

  test("signFlipTest: all-zero differences are never beaten (p = 1); " +
      "the replicate census matches a driver-side hash reference") {
    val zeros = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("id", "d")
    val z = Relational.signFlipTest(zeros, "id", "d", b = 50).head()
    assert(z.getAs[Long]("n_extreme") == 50L)
    assert(z.getAs[Long]("p_ppm") == 1000000L)
    // reference replay of the exact hash/sign arithmetic
    val data = Seq((1L, 100L), (2L, 1L), (7L, -40L))
    val bN = 50
    val obs = math.abs(data.map(_._2).sum)
    val ref = (1 to bN).count { b =>
      math.abs(data.map { case (id, d) =>
        val h = ((id % 1000000007L) * 1103515245L + b * 12345L) %
          1000000007L % 2
        if (h == 0) d else -d
      }.sum) >= obs
    }
    val r = Relational.signFlipTest(data.toDF("id", "d"), "id", "d",
      b = bN).head()
    assert(r.getAs[Long]("n_extreme") == ref.toLong)
    assert(r.getAs[Long]("p_ppm") ==
      (1L + ref) * 1000000L / (bN + 1))
  }

  test("invariances: CUSUM is level-shift invariant, MI is symmetric " +
      "in its arguments, gamma flips sign under y-negation") {
    // cusum: D_i = n*C_i - S*i is unchanged by x -> x + c
    val ts = Seq((1L, 1L, 3L), (2L, 2L, 9L), (3L, 3L, 1L),
      (4L, 4L, 7L), (5L, 5L, 2L)).toDF("t", "eid", "x")
    val shifted = ts.withColumn("x", col("x") + 1000L)
    val a = Relational.cusumMeanShift(ts, "t", "x", Seq("eid")).head()
    val b = Relational.cusumMeanShift(shifted, "t", "x", Seq("eid"))
      .head()
    assert(a.getAs[Long]("t_star") == b.getAs[Long]("t_star"))
    assert(a.getAs[Double]("d_stat") == b.getAs[Double]("d_stat"))
    // MI symmetry: swapping x and y swaps the marginal entropies and
    // keeps mi/nmi
    val df = Seq(("a", 0L), ("a", 1L), ("b", 1L), ("b", 1L), ("c", 0L))
      .toDF("x", "y")
    val m1 = Relational.mutualInformation(df, "x", "y").head()
    val m2 = Relational.mutualInformation(
      df.select(col("y").as("x2"), col("x").as("y2")), "x2", "y2")
      .head()
    assert(m1.getAs[Long]("mi_micro") == m2.getAs[Long]("mi_micro"))
    assert(m1.getAs[Long]("h_x_micro") == m2.getAs[Long]("h_y_micro"))
    assert(m1.getAs[Double]("nmi") == m2.getAs[Double]("nmi"))
    // gamma antisymmetry under y -> -y (concordant <-> discordant)
    val g = Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)).toDF("x", "y")
    val g1 = Relational.somersGamma(g, "x", "y").head()
    val g2 = Relational.somersGamma(
      g.select(col("x"), (-col("y")).as("y")), "x", "y").head()
    assert(g1.getAs[Double]("gamma") == -g2.getAs[Double]("gamma"))
    assert(g1.getAs[Long]("c_pairs") == g2.getAs[Long]("d_pairs"))
  }

  test("sequencePairSupport: precedence reads first-vs-last " +
      "occurrence order per key, both directions independently") {
    val df = Seq((1L, 1L, "a", 1L), (1L, 2L, "b", 2L),
      (1L, 3L, "a", 3L), (2L, 1L, "b", 4L), (2L, 2L, "a", 5L))
      .toDF("u", "t", "ty", "eid")
    val r = graft.engine.Windows.sequencePairSupport(df, "u", "t",
        "ty", Seq("eid"))
      .collect()
      .map(x => (x.getString(0), x.getString(1)) -> x).toMap
    // user 1 has a<b and b<a (a recurs); user 2 only b<a
    assert(r(("a", "b")).getAs[Long]("n_keys") == 2L)
    assert(r(("a", "b")).getAs[Long]("support_ppm") == 500000L)
    assert(r(("b", "a")).getAs[Long]("support_ppm") == 1000000L)
  }

  test("brierDecomposition: two-bin worked example reads the " +
      "explicit-floor REL/RES/UNC") {
    val df = Seq((100000L, true), (100000L, false),
      (900000L, true), (900000L, true)).toDF("p", "y")
    val r = Relational.brierDecomposition(df, "p", "y", bins = 10)
      .head()
    assert(r.getAs[Long]("n") == 4L && r.getAs[Long]("n_pos") == 3L)
    // rel = (2e5-1e6)^2/2 + (18e5-2e6)^2/2 = 3.2e11 + 2e10
    assert(r.getAs[Long]("rel_micro") == 340000000000L / 4000000L)
    // obar = 750000; res = 2*(5e5-75e4)^2 + 2*(1e6-75e4)^2 = 2.5e11
    assert(r.getAs[Long]("res_micro") == 62500L)
    assert(r.getAs[Long]("unc_micro") == 187500L)
  }
}
