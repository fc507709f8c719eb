package graft

import org.apache.spark.sql.functions._
import graft.engine.{Relational, Windows}
import graft.llm.Eval

/** Hand-value pins for the q405/q406/q408 wave: ERR@k cascade
  * discounting, Jonckheere–Terpstra ordered dominance (direction
  * flips with the declared order), Markov entropy rate (deterministic
  * chain pins 0, a fair binary branch pins ln 2 per visit).
  * q407 TextRank is a composition of the already-pinned pageRankPpm
  * and is gated by its DuckDB oracle at two SFs.
  */
class CascadeChainWaveSpec extends SparkSpec {
  import spark.implicits._

  test("errAtK: cascade discount halves past each relevant hit and " +
      "divides by rank; zero-relevant queries report 0") {
    val corpus = Seq(
      (0L, Array(1f, 0f), 7),  // query, label 7
      (1L, Array(1f, 0f), 7),  // rank 1 (cos 1, nid tiebreak), relevant
      (2L, Array(1f, 0f), 5),  // rank 2, not relevant
      (3L, Array(1f, 0f), 7),  // rank 3, relevant (one rel before)
      (10L, Array(0f, 1f), 9)  // query, label 9: nothing relevant
    ).toDF("vec_id", "embedding", "label")
    val q = corpus.filter(col("vec_id") === 0L || col("vec_id") === 10L)
    val r = Eval.errAtK(corpus, q, "vec_id", "embedding", "label",
        "vec_id", k = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    // 10^6·(1/2)/1 + round(10^6·(1/4)/3) = 500000 + 83333
    assert(r(0L).getAs[Long]("n_rel_topk") == 2L)
    assert(r(0L).getAs[Long]("err_micro") == 583333L)
    assert(r(10L).getAs[Long]("n_rel_topk") == 0L)
    assert(r(10L).getAs[Long]("err_micro") == 0L)
  }

  test("jonckheereTerpstra: full dominance in order gives JT2 = " +
      "2*n_a*n_b and z from the tie-free variance; reversing the " +
      "declared order flips the sign") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v")
    val up = Relational.jonckheereTerpstra(df, "g", Seq("a", "b"), "v")
      .head()
    assert(up.getAs[Int]("k") == 2 && up.getAs[Long]("n") == 4L)
    assert(up.getAs[Long]("jt2") == 8L)
    // mu = (16-8)/4 = 2, var = (176-56)/72, z = 2/sqrt(5/3)
    assert(math.abs(up.getAs[Double]("z") - 1.549193) < 1e-6)

    val down = Relational.jonckheereTerpstra(df, "g", Seq("b", "a"), "v")
      .head()
    assert(down.getAs[Long]("jt2") == 0L)
    assert(math.abs(down.getAs[Double]("z") + 1.549193) < 1e-6)

    // ties contribute half: identical groups center JT2 at 2*mu
    val tied = Seq(("a", 5L), ("a", 6L), ("b", 5L), ("b", 6L))
      .toDF("g", "v")
    val t = Relational.jonckheereTerpstra(tied, "g", Seq("a", "b"), "v")
      .head()
    assert(t.getAs[Long]("jt2") == 4L) // 2*less + ties = 0+1 twice...
  }

  test("markovEntropyRate: a deterministic cycle has rate 0; a fair " +
      "binary branch contributes ln 2 micro-nats at its state") {
    val cyc = Seq((1L, 1, "a", 1L), (1L, 2, "b", 2L), (1L, 3, "a", 3L),
      (1L, 4, "b", 4L), (1L, 5, "a", 5L))
      .toDF("user_id", "ts", "state", "event_id")
    val rc = Windows.markovEntropyRate(cyc, "user_id", "ts", "state",
        Seq("event_id"), steps = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rc("a").getAs[Long]("h_state_micro") == 0L)
    assert(rc("b").getAs[Long]("h_state_micro") == 0L)
    assert(rc("a").getAs[Long]("entropy_rate_micro") == 0L)

    // a -> b, b -> a, a -> c: p(a->b) = p(a->c) = 1/2, p(b->a) = 1
    val br = Seq((1L, 1, "a", 1L), (1L, 2, "b", 2L), (1L, 3, "a", 3L),
      (1L, 4, "c", 4L))
      .toDF("user_id", "ts", "state", "event_id")
    val rb = Windows.markovEntropyRate(br, "user_id", "ts", "state",
        Seq("event_id"), steps = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    // 2 * round(500000 * ln 2) = 2 * 346574
    assert(rb("a").getAs[Long]("h_state_micro") == 693148L)
    assert(rb("b").getAs[Long]("h_state_micro") == 0L)
    // rate = round(pi_a * 693148 / 10^6) with the reported pi_a
    val piA = rb("a").getAs[Long]("pi_ppm")
    assert(rb("a").getAs[Long]("entropy_rate_micro") ==
      math.round(piA.toDouble * 693148 / 1e6))
  }
}
