package graft

import org.apache.spark.sql.functions._
import graft.engine.{Joins, Relational}
import graft.llm.Eval

/** Hand-value pins for the q389–q392 wave: salted equi-join identity,
  * self-BLEU leave-one-out clips, Theil decomposition terms, Wilcoxon
  * signed-rank (with and without ties).
  */
class ScaleDiversityWaveSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin: output multiset identical to the plain join on " +
      "a skewed key, duplicates preserved") {
    // key 1 is hot (4 fact rows, incl. an exact duplicate pair)
    val fact = Seq((1L, 10), (1L, 10), (1L, 20), (1L, 30), (2L, 40),
      (3L, 50)).toDF("k", "x")
    val dim = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "name")
    val salted = Joins.saltedEquiJoin(fact, dim, "k", salt = 4)
      .groupBy("k", "x", "name").count()
    val plain = fact.join(dim, "k").groupBy("k", "x", "name").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key contributes all 4 rows (one per fact row incl. dup)
    assert(Joins.saltedEquiJoin(fact, dim, "k", 4)
      .filter(col("k") === 1L).count() == 4)
  }

  test("selfBleu: 3-doc hand example — unique-argmax doc clips to m2, " +
      "singleton grams clip to 0") {
    val docs = Seq(
      (1L, "a b a b", "s"),   // "a b"x2 (unique max), "b a"x1
      (2L, "a b x", "s"),     // "a b"x1 (clip 2), "b x" singleton
      (3L, "y z", "s"))       // singleton gram only
      .toDF("doc_id", "text", "source")
    val r = Eval.selfBleu(docs, "doc_id", "text", "source").head()
    // ppms: d1=333333, d2=500000, d3=0 -> mean DIV = 277777
    assert(r.getAs[Long]("n_docs") == 3L)
    assert(r.getAs[Long]("self_bleu2_ppm") == 277777L)

    // duplicated template across docs -> clip never drops, ppm = 1e6
    val dup = Seq((1L, "p q p q", "t"), (2L, "p q p q", "t"))
      .toDF("doc_id", "text", "source")
    assert(Eval.selfBleu(dup, "doc_id", "text", "source")
      .head().getAs[Long]("self_bleu2_ppm") == 1000000L)
  }

  test("theilDecomposition: equal-within groups have zero inner term; " +
      "between terms match ln hand values") {
    val df = (Seq.fill(4)(("A", 1L)) :+ (("B", 4L))).toDF("src", "x")
    val out = Relational.theilDecomposition(df, "src", "x")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("theil_in_micro") == 0L)
    assert(out("B").getAs[Long]("theil_in_micro") == 0L)
    assert(out("A").getAs[Long]("share_ppm") == 500000L)
    assert(out("A").getAs[Long]("between_term_micro") ==
      math.round(0.5 * math.log(0.625) * 1e6))
    assert(out("B").getAs[Long]("between_term_micro") ==
      math.round(0.5 * math.log(2.5) * 1e6))
  }

  test("wilcoxonSignedRank: tie-free hand example z = 1.5/sqrt(13.75), " +
      "tied example uses average ranks + tie-corrected variance, " +
      "zeros dropped") {
    val a = Seq(1L, -2L, 3L, -4L, 5L, 0L).map(("g", _)).toDF("g", "d")
    val ra = Relational.wilcoxonSignedRank(a, Seq("g"), "d").head()
    assert(ra.getAs[Long]("n_pairs") == 5L)      // the 0 is dropped
    assert(ra.getAs[Long]("w2_plus") == 18L)     // W+ = 9
    assert(math.abs(ra.getAs[Double]("z") - 1.5 / math.sqrt(13.75)) < 1e-6)

    val b = Seq(1L, -1L, 2L).map(("g", _)).toDF("g", "d")
    val rb = Relational.wilcoxonSignedRank(b, Seq("g"), "d").head()
    assert(rb.getAs[Long]("w2_plus") == 9L)      // avg-rank 1.5 doubled
    assert(math.abs(rb.getAs[Double]("z") - 1.5 / math.sqrt(3.375)) < 1e-6)
  }
}
