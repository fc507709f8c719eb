package graft

import org.apache.spark.sql.functions._
import graft.engine.Sketches
import graft.llm.{Curation, Similarity}

/** Continuation-wave operators: moments sketch + Cornish-Fisher
  * quantiles, grouped HLL, KMV/theta sketches, bigram-LM scoring,
  * SemDeDup. Each test pins the operator against a driver-side
  * re-derivation or an algebraic invariant (mergeability, exact-path
  * agreement) — the properties the oracle hash can't see.
  */
class SketchWaveSpec extends SparkSpec {
  import spark.implicits._

  private def mix(s: String): Long = {
    val ph = s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000000007L)
    ph * 2654435761L % 1000000007L
  }

  test("momentsSketch: power sums match a driver-side reference and " +
      "merge by elementwise sum") {
    val a = Seq(("g", 1), ("g", 2), ("g", 3), ("h", 10)).toDF("grp", "x")
    val b = Seq(("g", 4), ("h", 20)).toDF("grp", "x")
    def sums(df: org.apache.spark.sql.DataFrame) =
      Sketches.momentsSketch(df, Seq("grp"), "x").collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getDecimal(2).longValue,
          r.getDecimal(3).longValue, r.getDecimal(4).longValue,
          r.getDecimal(5).longValue, r.getLong(6), r.getLong(7)))
      }.toMap
    val sa = sums(a)
    assert(sa("g") == ((3L, 6L, 14L, 36L, 98L, 1L, 3L)))
    assert(sa("h") == ((1L, 10L, 100L, 1000L, 10000L, 10L, 10L)))
    // mergeability: sketch(a ∪ b) = elementwise sum (+ min/max)
    val sb = sums(b); val su = sums(a.union(b))
    Seq("g", "h").foreach { g =>
      val (na, s1a, s2a, s3a, s4a, mna, mxa) = sa(g)
      val (nb, s1b, s2b, s3b, s4b, mnb, mxb) = sb(g)
      assert(su(g) == ((na + nb, s1a + s1b, s2a + s2b, s3a + s3b,
        s4a + s4b, math.min(mna, mnb), math.max(mxa, mxb))))
    }
  }

  test("momentsQuantiles: zero-variance group degenerates to the mean; " +
      "estimates clamp to [min,max] and order with the probes") {
    val flat = Seq.fill(5)(("c", 7)).toDF("grp", "x")
    val qs = Sketches.momentsQuantiles(
      Sketches.momentsSketch(flat, Seq("grp"), "x"), Seq("grp"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(qs.size == 4 && qs.values.forall(_ == 7.0))
    // a right-skewed sample: quantile estimates are monotone in p and
    // stay inside the observed range
    val skewed = ((1 to 20).map(i => ("s", 1)) ++ Seq(("s", 50)))
      .toDF("grp", "x")
    val sq = Sketches.momentsQuantiles(
      Sketches.momentsSketch(skewed, Seq("grp"), "x"), Seq("grp"))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(sq("p25") <= sq("p50") && sq("p50") <= sq("p75") &&
      sq("p75") <= sq("p90"))
    sq.values.foreach(v => assert(v >= 1.0 && v <= 50.0))
  }

  test("hllGroupedEstimate: each group's row equals the ungrouped " +
      "hllEstimate of that group's slice") {
    val df = (1 to 600).map(i => (s"t${i % 3}", s"u${i % 257}"))
      .toDF("grp", "v")
    val grouped = Sketches.hllGroupedEstimate(df, Seq("grp"), "v", p = 6)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    Seq("t0", "t1", "t2").foreach { g =>
      val single = Sketches.hllEstimate(
        df.filter(col("grp") === g).select(col("v")), "v", p = 6)
        .collect().head
      assert(grouped(g) == ((single.getInt(0), single.getLong(1),
        single.getDouble(2), single.getDouble(3))),
        s"group $g must match its ungrouped slice")
    }
  }

  test("kmvSketch/kmvDistinct: k smallest mixed hashes, exact when " +
      "unsaturated, estimate tracks truth when saturated") {
    val vals = (1 to 500).map(i => ("g", s"v$i")) ++
      (1 to 10).map(i => ("h", s"v$i"))
    val df = vals.toDF("grp", "v")
    val sk = Sketches.kmvSketch(df, Seq("grp"), "v", k = 32)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val wantG = (1 to 500).map(i => mix(s"v$i")).distinct.sorted.take(32)
    assert(sk.filter(_._1 == "g").sortBy(_._2).map(_._3).toSeq == wantG)
    assert(sk.filter(_._1 == "h").map(_._3).sorted.toSeq ==
      (1 to 10).map(i => mix(s"v$i")).distinct.sorted)
    val est = Sketches.kmvDistinct(df, Seq("grp"), "v", k = 32)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(3)))).toMap
    assert(est("h") == ((10, 10.0)), "unsaturated sketch is exact")
    val (nk, eg) = est("g")
    assert(nk == 32 && math.abs(eg - 500) / 500.0 < 0.5,
      s"saturated estimate $eg must track 500 within KMV error at k=32")
  }

  test("kmvPairSimilarity: identical sets → 1, disjoint sets → 0, " +
      "partial overlap lands in between") {
    val df = ((1 to 100).map(i => ("a", s"v$i")) ++
      (1 to 100).map(i => ("b", s"v$i")) ++
      (101 to 200).map(i => ("c", s"v$i")) ++
      (51 to 150).map(i => ("d", s"v$i"))).toDF("grp", "v")
    val out = Sketches.kmvPairSimilarity(df, "grp", "v", k = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(4)).toMap
    assert(out(("a", "b")) == 1.0)
    assert(out(("a", "c")) == 0.0)
    assert(out(("a", "d")) > 0.0 && out(("a", "d")) < 1.0)
    assert(out.size == 6)
  }

  test("bigramLogProbScore: short docs score null, repeated-bigram docs " +
      "outscore novel-bigram docs, values match a hand model") {
    val docs = Seq((1L, "a b a b a b"), (2L, "c d"), (3L, "e"),
      (4L, "a b")).toDF("doc_id", "text")
    val out = Curation.bigramLogProbScore(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(3L).getInt(1) == 0 && out(3L).isNullAt(2) &&
      out(3L).isNullAt(3), "1-token doc: no bigrams, null scores")
    // vocab = {a,b,c,d,e}, V=5; c1(a)=4, c2(a,b)=4 → p(b|a)=(4.5)/(6.5)
    // c1(b)=4, c2(b,a)=2 → p(a|b)=2.5/6.5 ; doc1 = [ab,ba,ab,ba,ab]
    val pab = math.log(4.5 / 6.5); val pba = math.log(2.5 / 6.5)
    val want1 = (3 * pab + 2 * pba) / 5.0
    assert(math.abs(out(1L).getDouble(2) -
      math.rint(want1 * 1e6) / 1e6) < 1e-9)
    assert(out(4L).getInt(1) == 1 &&
      out(4L).getDouble(2) > out(2L).getDouble(2),
      "the corpus-dominant bigram must outscore the rare one")
    // ppl = e^(−mean) of the unrounded mean
    assert(math.abs(out(1L).getDouble(3) -
      math.rint(math.exp(-want1) * 1e6) / 1e6) < 1e-9)
  }

  test("momentsSketch property: random integer corpora match the " +
      "driver-side reference under any partitioning") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    val rowGen = Gen.zip(Gen.oneOf("g", "h", "i"), Gen.chooseNum(-999, 999))
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { rows =>
      val want = rows.groupBy(_._1).view.mapValues { vs =>
        val xs = vs.map(_._2.toLong)
        (xs.size.toLong, xs.sum, xs.map(x => x * x).sum,
          xs.map(x => x * x * x).sum, xs.map(x => x * x * x * x).sum,
          xs.min, xs.max)
      }.toMap
      val got = (n: Int) => Sketches.momentsSketch(
        rows.toDF("grp", "x").repartition(n), Seq("grp"), "x")
        .collect().map { r => r.getString(0) ->
          ((r.getLong(1), r.getDecimal(2).longValue,
            r.getDecimal(3).longValue, r.getDecimal(4).longValue,
            r.getDecimal(5).longValue, r.getLong(6), r.getLong(7)))
        }.toMap
      Prop(got(1) == want && got(7) == want)
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"moments sketch diverged: ${res.status}")
  }

  test("kmvSketch property: random string multisets yield exactly the " +
      "k smallest distinct mixed hashes") {
    import org.scalacheck.{Gen, Prop, Test => SchkTest}
    val rowGen = Gen.chooseNum(0, 400).map(i => s"v$i")
    val prop = Prop.forAll(Gen.nonEmptyListOf(rowGen)) { vs =>
      val want = vs.distinct.map(mix).distinct.sorted.take(16)
      val got = Sketches.kmvSketch(vs.map(("g", _)).toDF("grp", "v"),
        Seq("grp"), "v", k = 16)
        .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      Prop(got == want)
    }
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, s"kmv sketch diverged: ${res.status}")
  }

  test("ivfPqTopK: every neighbor shares the query's LSH cell, and " +
      "scores agree with pqAdcTopK restricted to that cell") {
    import org.apache.spark.sql.DataFrame
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cb = Similarity.pqCodebooks(emb, "embedding", "label", m = 2,
      dim = 64)
    val anchors = Similarity.firstVectors(emb, "vec_id", "embedding", 4)
    val queries = emb.filter(col("vec_id") < 4)
    val got = Similarity.ivfPqTopK(emb, cb, queries, "vec_id", "vec_id",
      "embedding", k = 5, anchors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def cells(df: DataFrame) = Similarity.lshBuckets(df, "embedding",
        anchors).select(col("vec_id"), col("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cell = cells(emb)
    got.foreach { case (q, n, _) =>
      assert(cell(n) == cell(q), s"neighbor $n outside query $q's cell") }
    // per query, the ADC scores equal pqAdcTopK over ONLY its cell
    got.groupBy(_._1).foreach { case (q, rows) =>
      val inCell = emb.filter(col("vec_id").isInCollection(
        cell.filter(_._2 == cell(q)).keys.toSeq))
      val want = Similarity.pqAdcTopK(
        Similarity.pqEncode(inCell, "vec_id", "embedding", cb), cb,
        queries.filter(col("vec_id") === q), "vec_id", "vec_id",
        "embedding", k = 5)
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSet
      assert(rows.map(r => (r._2, r._3)).toSet == want,
        s"query $q: IVF-PQ must equal cell-restricted ADC")
    }
  }

  test("semDedup: exact duplicates collapse to one survivor per family, " +
      "singletons all survive, every input row is emitted") {
    def v(xs: Double*) = xs.toArray
    // two orthogonal families: {1,2 dup}, {3}, plus centroid seeds 10,20
    val corpus = Seq(
      (10L, v(1, 0, 0, 0)), (20L, v(0, 1, 0, 0)), // seeds = centroids
      // dup family at cos 0.8 from its seed (below the 0.95 threshold,
      // so the seed itself is not a family member)
      (1L, v(0.8, 0.6, 0, 0)), (2L, v(0.8, 0.6, 0, 0)), // exact dups
      (3L, v(0.6, 0.8, 0, 0))).toDF("vec_id", "embedding")
    val cents = corpus.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("centroid"))
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", cents,
      "cid", minCos = 0.95, maxCluster = 100)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(out.size == 5, "one output row per input vector")
    val fam = Seq(1L, 2L).map(id => out(id))
    assert(fam.map(_._1).distinct.size == 1, "dups share a cluster")
    assert(fam.count(_._2) == 1, "exactly one family member survives")
    assert(out(3L)._2 && out(10L)._2 && out(20L)._2,
      "non-duplicated vectors all survive")
  }

  test("logHistogramSketch: integer bucket lattice matches a driver " +
      "model, merges by summed counts, sentinel holds non-positives") {
    def model(x: Long, s: Int): (Int, Int, Long) =
      if (x < 1) (-1, 0, 0L)
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
        val pw = 1L << e
        (e, (((x - pw) * s) / pw).toInt, pw)
      }
    val xs = Seq(-3L, 0L, 1L, 2L, 3L, 7L, 8L, 15L, 16L, 17L, 100L,
      1023L, 1024L, 1L << 40, (1L << 40) + (1L << 37))
    val df = xs.map(("g", _)).toDF("grp", "x")
    val got = Sketches.logHistogramSketch(df, Seq("grp"), "x", s = 8)
      .collect().map(r => ((r.getInt(1), r.getInt(2), r.getLong(3)),
        r.getLong(4))).toMap
    val want = xs.map(model(_, 8)).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(got == want)
    assert(got.values.sum == xs.size, "every row lands in one bucket")
    // mergeability: sketch(a ∪ b) = summed counts on the shared lattice
    val b = Seq(("g", 3L), ("g", 900L)).toDF("grp", "x")
    val mb = Sketches.logHistogramSketch(df.union(b), Seq("grp"), "x", 8)
      .collect().map(r => ((r.getInt(1), r.getInt(2), r.getLong(3)),
        r.getLong(4))).toMap
    val wantB = (xs ++ Seq(3L, 900L)).map(model(_, 8)).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(mb == wantB)
  }

  test("logHistogramQuantiles: every estimate sits within the gamma " +
      "bucket of the true rank value (relative error <= (gamma-1)/2)") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(5000)(math.max(1L, (math.exp(rnd.nextGaussian()
      * 2 + 6)).toLong))
    val df = xs.map(("g", _)).toDF("grp", "x")
    val sk = Sketches.logHistogramSketch(df, Seq("grp"), "x", s = 8)
    val est = Sketches.logHistogramQuantiles(sk, Seq("grp"), s = 8)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val sorted = xs.sorted
    val probes = Seq("p25" -> 250, "p50" -> 500, "p75" -> 750,
      "p90" -> 900, "p99" -> 990)
    probes.foreach { case (nm, num) =>
      val r = (num.toLong * xs.size + 999) / 1000
      val truth = sorted((r - 1).toInt).toDouble
      // midpoint of the bucket containing the rank value: off by at most
      // half the bucket's relative width, (2^(1/8)-1)/2 ~ 4.53%
      assert(math.abs(est(nm) - truth) / truth <= 0.046,
        s"$nm: est=${est(nm)} truth=$truth")
    }
  }

  test("amsF2: exact F2 is the self-join size, the 4-wise estimate " +
      "lands inside the median-of-means band, and the sketch is " +
      "partition-invariant") {
    val rnd = new scala.util.Random(11)
    // zipf-ish key multiset: many singletons + a few heavy keys
    val keys = (1 to 3000).map(i => s"k$i") ++
      (1 to 20).flatMap(i => Seq.fill(40)(s"hot$i"))
    val df = rnd.shuffle(keys).map(Tuple1(_)).toDF("key")
    val exact = keys.groupBy(identity).values
      .map(v => v.size.toLong * v.size).sum
    val r1 = Sketches.amsF2(df.repartition(1), "key", d = 5, g = 16)
      .collect().head
    val r7 = Sketches.amsF2(df.repartition(7), "key", d = 5, g = 16)
      .collect().head
    assert(r1.getLong(3) == exact, "f2_exact is the self-join row count")
    assert(r1.getLong(2) == r7.getLong(2),
      "integer sketch state is partition-invariant")
    val rel = math.abs(r1.getLong(2) - exact).toDouble / exact
    assert(rel <= 0.60, s"estimate off by $rel at (d=5, g=16)")
  }

  test("kmvInclusion: unsaturated sketches give EXACT containment on " +
      "subset / superset / disjoint column pairs") {
    val a = (1 to 40).map(i => Tuple1(i)).toDF("v") // A strict subset of B
    val b = (1 to 100).map(i => Tuple1(i)).toDF("v")
    val c = (1000 to 1050).map(i => Tuple1(i)).toDF("v") // disjoint
    val out = Sketches.kmvInclusion(
      Seq(("a", a, "v"), ("b", b, "v"), ("c", c, "v")), k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(("a", "b")) == ((40L, 40L, 1.0)), "A fully inside B")
    assert(out(("b", "a")) == ((100L, 40L, 0.4)), "B covers A 40/100")
    assert(out(("a", "c"))._3 == 0.0 && out(("c", "a"))._3 == 0.0,
      "disjoint columns report zero containment")
  }
}
