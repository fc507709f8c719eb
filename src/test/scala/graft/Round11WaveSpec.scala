package graft

import org.apache.spark.sql.functions._
import graft.engine.{Graph, Relational}
import graft.llm.{Dedup, Eval, Lexical, Similarity}

/** Hand-value pins for the q366–q372 wave: capped PPJoin, WER,
  * Dirichlet query likelihood, linear CKA, ECOD, edge triangle support,
  * stitch pairs — goldens where the arithmetic is exact plus the
  * invariants the oracle hash can't see.
  */
class Round11WaveSpec extends SparkSpec {
  import spark.implicits._

  test("EditDistTokens: hand goldens — identity 0, disjoint max(len), " +
      "classic kitten/sitting on tokens, empty sides") {
    val rows = Seq(
      ("a b c", "a b c", 0),
      ("a b c", "x y z", 3),
      ("k i t t e n", "s i t t i n g", 3),   // classic, one token per char
      ("a b c d", "b c d", 1),               // one delete
      ("b c d", "a b c d", 1),               // one insert
      ("", "a b c", 3),                      // all-insert
      ("a b", "", 2))                        // all-delete
    rows.foreach { case (a, b, want) =>
      val d = Seq((a, b)).toDF("ta", "tb")
        .select(graft.functions.EditDistTokens.editDistTokens(
          split(col("ta"), " +").cast("array<string>"),
          split(col("tb"), " +").cast("array<string>")).as("d"))
        .head().getInt(0)
      // split("") yields [""], not [] — route through the same filter
      // the engine tokenizer applies
      if (a.nonEmpty && b.nonEmpty) assert(d == want, s"($a, $b)")
    }
    // empty-array cases exactly
    val e = Seq(1).toDF("x").select(
      graft.functions.EditDistTokens.editDistTokens(
        expr("CAST(array() AS ARRAY<STRING>)"),
        expr("array('a', 'b', 'c')")).as("d1"),
      graft.functions.EditDistTokens.editDistTokens(
        expr("array('a', 'b')"),
        expr("CAST(array() AS ARRAY<STRING>)")).as("d2")).head()
    assert(e.getInt(0) == 3 && e.getInt(1) == 2)
  }

  test("EditDistTokens: triangle vs LcsTokens bound — " +
      "dist >= max(n,m) - lcs on random token arrays") {
    val rnd = new scala.util.Random(7)
    val words = Vector("a", "b", "c", "d")
    val pairs = (1 to 60).map { _ =>
      def arr() = (0 until 1 + rnd.nextInt(8))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      (arr(), arr())
    }
    val got = pairs.toDF("ta", "tb").select(
      split(col("ta"), " +").as("a"), split(col("tb"), " +").as("b"))
      .select(size(col("a")).as("n"), size(col("b")).as("m"),
        graft.functions.EditDistTokens.editDistTokens(col("a"), col("b"))
          .as("d"),
        graft.functions.LcsTokens.lcsTokens(col("a"), col("b")).as("l"))
      .collect()
    got.foreach { r =>
      val (n, m, d, l) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(d >= math.max(n, m) - l && d <= n + m - 2 * l,
        s"n=$n m=$m d=$d lcs=$l")
      assert(d <= math.max(n, m))
    }
  }

  test("wer: hand pair — 2 errors over 4 reference tokens = 500000 ppm") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the slow brown cat"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("cand_id", "ref_id")
    val r = Eval.wer(docs, pairs, "doc_id", "text", "cand_id", "ref_id",
      maxTokens = 10).head()
    assert(r.getLong(2) == 4 && r.getLong(3) == 4)  // lengths
    assert(r.getLong(4) == 2, "quick->slow, fox->cat")
    assert(r.getLong(5) == 500000L)
  }

  test("dirichletQueryLikelihood: matching doc outranks non-matching " +
      "of equal length; absent-everywhere terms drop from the model") {
    val docs = Seq(
      (1L, "spark spark merge window alpha beta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "merge window merge window spark spark"))
      .toDF("doc_id", "text")
    val r = Lexical.dirichletQueryLikelihood(docs, "doc_id", "text",
      Seq("spark", "window", "merge", "zzzmissing"), mu = 100L, k = 3)
      .collect()
    assert(r.forall(_.getLong(2) == 3), "zzzmissing (cf=0) dropped")
    val byRank = r.sortBy(_.getInt(5)).map(_.getLong(0)).toSeq
    assert(byRank.head == 3L, "doc 3 has the most query mass")
    assert(byRank.last == 2L, "doc 2 has none")
    // every doc scores (smoothing) — 3 rows for 3 docs at k=3
    assert(r.length == 3)
  }

  test("linearCka: identical representations give exactly 10^6 micro; " +
      "a rotated copy keeps CKA 1; constant columns yield null") {
    val vecs = Seq(
      Array(0.1f, 0.9f, -0.3f), Array(0.5f, -0.2f, 0.7f),
      Array(-0.6f, 0.4f, 0.2f), Array(0.9f, 0.1f, -0.8f))
    val same = vecs.map(v => (v, v)).toDF("ex", "ey")
    assert(Similarity.linearCka(same, "ex", "ey").head()
      .getLong(5) == 1000000L)
    // permuting FEATURE axes is an orthogonal transform: CKA stays 1
    val rot = vecs.map(v => (v, Array(v(1), v(2), v(0)))).toDF("ex", "ey")
    assert(Similarity.linearCka(rot, "ex", "ey").head()
      .getLong(5) == 1000000L)
    // zero-variance input: denominator 0 -> null score, not a crash
    val const = Seq((Array(1f, 1f), Array(1f, 2f)),
      (Array(1f, 1f), Array(1f, 2f))).toDF("ex", "ey")
    assert(Similarity.linearCka(const, "ex", "ey").head().isNullAt(5))
  }

  test("ecodOutliers: a planted two-sided outlier tops the ranking; " +
      "left/right tails are counted inclusively") {
    // feature: 50 values at 10, one at 1000 (right tail), one at -1000
    val rows = (1L to 50L).map(i => (i, 10L)) ++
      Seq((98L, 1000L), (99L, -1000L))
    val df = rows.toDF("id", "f")
    val r = Relational.ecodOutliers(df, "id", Seq("f"), k = 3).collect()
    assert(r.map(_.getLong(0)).take(2).toSet == Set(98L, 99L),
      "both planted extremes outrank the bulk")
    val top = r.find(_.getLong(0) == 99L).get
    // left tail of -1000 is 1/52; score_left = round(ln(52/1)*1e6)
    assert(top.getLong(2) ==
      math.round(math.log(52.0) * 1000000), "exact tail log")
  }

  test("edgeTriangleSupport: K4 minus one edge — shared edges support 2, " +
      "others 1, bridge edge 0") {
    // K4 on {1,2,3,4} minus edge (3,4), plus pendant edge (4,5)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (4L, 5L)).toDF("a", "b")
    val got = Graph.edgeTriangleSupport(e, "a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // triangles: {1,2,3} and {1,2,4}
    assert(got((1L, 2L)) == 2)
    assert(got((1L, 3L)) == 1 && got((2L, 3L)) == 1)
    assert(got((1L, 4L)) == 1 && got((2L, 4L)) == 1)
    assert(got((4L, 5L)) == 0, "pendant edge present with support 0")
    assert(got.size == 6)
  }

  test("stitchPairs: a planted seam links the two halves; short docs " +
      "and sub-threshold overlaps stay silent; hot seam cap drops " +
      "a template boundary") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "delta epsilon zeta eta theta iota"),   // head = 1's tail (k=3)
      (3L, "one two"),                              // too short
      (4L, "epsilon zeta eta unrelated suffix x")) // overlap 2 < k
      .toDF("doc_id", "text")
    val got = Dedup.stitchPairs(docs, "doc_id", "text", kTokens = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // hot-seam cap: 5 docs ending + 5 starting with the same boundary
    val tmpl = (1L to 5L).map(i => (i, s"body$i words here end seam one")) ++
      (11L to 15L).map(i => (i, s"end seam one tail$i words here"))
    val capped = Dedup.stitchPairs(tmpl.toDF("doc_id", "text"),
      "doc_id", "text", kTokens = 3, maxKey = 4)
    assert(capped.count() == 0, "seam shared by 5 > maxKey=4 drops")
    assert(Dedup.stitchPairs(tmpl.toDF("doc_id", "text"),
      "doc_id", "text", kTokens = 3, maxKey = 5).count() == 25)
  }
}
