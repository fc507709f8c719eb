package graft

import org.apache.spark.sql.functions._
import graft.llm.Eval

/** Hand-value pins for the q318-q320 wave: average precision, Kendall
  * tau list agreement, and the native Damerau-Levenshtein expression.
  */
class RankEvalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("averagePrecision: hand PR step areas, tie blocks collapse to " +
      "one threshold, no-positive group is null") {
    // g1: (10,+)(9,-)(8,+)(7,-) -> AP = 1*0.5 + (2/3)*0.5 = 0.833333
    // g2: tie block (10,+)(10,-) then (5,+) -> AP = 0.5*0.5 + (2/3)*0.5
    // g3: no positives -> null
    val df = Seq(("g1", 10L, 1), ("g1", 9L, 0), ("g1", 8L, 1),
      ("g1", 7L, 0), ("g2", 10L, 1), ("g2", 10L, 0), ("g2", 5L, 1),
      ("g3", 4L, 0), ("g3", 2L, 0)).toDF("g", "score", "lab")
    val r = Eval.averagePrecision(df.repartition(3), Seq("g"),
        "score", "lab")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("g1").getLong(1) == 2 && r("g1").getLong(2) == 2)
    assert(r("g1").getLong(3) == 833333L)
    assert(r("g1").getDouble(4) == 0.833333)
    assert(r("g2").getLong(3) == 583333L)
    assert(r("g3").isNullAt(3) && r("g3").isNullAt(4))
    // perfect ranking -> AP = 1 exactly
    val perfect = Seq(("p", 9L, 1), ("p", 8L, 1), ("p", 3L, 0))
      .toDF("g", "score", "lab")
    val rp = Eval.averagePrecision(perfect, Seq("g"), "score", "lab")
      .collect().head
    assert(rp.getLong(3) == 1000000L && rp.getDouble(4) == 1.0)
  }

  test("kendallTauLists: hand concordance, reversal is -1, disjoint " +
      "lists carry zero common and null tau") {
    val a = Seq((1L, "A", 1), (1L, "B", 2), (1L, "C", 3),
      (2L, "A", 1), (2L, "B", 2), (2L, "C", 3),
      (3L, "X", 1), (3L, "Y", 2)).toDF("q", "id", "r")
    val b = Seq((1L, "A", 1), (1L, "B", 3), (1L, "C", 2),
      (2L, "A", 3), (2L, "B", 2), (2L, "C", 1),
      (3L, "P", 1), (3L, "Q", 2)).toDF("q", "id", "r")
    val r = Eval.kendallTauLists(a, b, "q", "id", "r")
      .collect().map(x => x.getLong(0) -> x).toMap
    // q1: one swapped pair among 3 -> C=2, D=1, tau = 1/3
    assert(r(1L).getInt(1) == 3 && r(1L).getLong(2) == 2 &&
      r(1L).getLong(3) == 1)
    assert(r(1L).getDouble(4) == 0.333333)
    // q2: full reversal -> tau = -1
    assert(r(2L).getLong(2) == 0 && r(2L).getLong(3) == 3 &&
      r(2L).getDouble(4) == -1.0)
    // q3: disjoint -> 0 common, null tau
    assert(r(3L).getInt(1) == 0 && r(3L).isNullAt(4))
  }

  test("damerauLevenshtein: DuckDB-built-in parity on the probe set " +
      "(true DL, not OSA), native expression in the plan") {
    import graft.functions.DamerauLevenshtein.damerauLevenshtein
    val cases = Seq(
      ("CA", "ABC", 2),      // the OSA discriminator (OSA says 3)
      ("ab", "ba", 1), ("abcdef", "abcfed", 2),
      ("kitten", "sitting", 3), ("", "abc", 3), ("abc", "", 3),
      ("same", "same", 0), ("ifhs", "fish", 2), ("BADC", "ABCD", 2),
      ("zx", "xyz", 2), ("a cat", "an act", 2), ("", "", 0))
    val got = cases.zipWithIndex
      .map { case ((a, b, _), i) => (i, a, b) }
      .toDF("i", "a", "b")
      .select(col("i"), damerauLevenshtein(col("a"), col("b")).as("dl"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    cases.zipWithIndex.foreach { case ((a, b, want), i) =>
      assert(got(i) == want, s"dl($a, $b) = ${got(i)}, want $want")
    }
    val docs = Queries.T(spark, "/root/testdata/sf0.001", "part")
      .select(col("p_name"))
    val plan = docs
      .select(damerauLevenshtein(col("p_name"), col("p_name")))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("damerau_levenshtein"),
      s"native expr missing:\n$plan")
  }
}
