package graft

import org.apache.spark.sql.functions._
import graft.llm.Eval

/** Evaluation operators (silhouette / nDCG / calibration): hand-model
  * goldens on orthogonal-cluster fixtures where every score is exact.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def v(xs: Double*) = xs.toArray

  test("silhouetteSampled: perfectly separated duplicate clusters score " +
      "1; singleton-cluster probes are skipped") {
    val corpus = Seq(
      (1L, v(1, 0, 0), 0), (2L, v(1, 0, 0), 0),
      (3L, v(0, 1, 0), 1), (4L, v(0, 1, 0), 1),
      (5L, v(0, 0, 1), 2)).toDF("vec_id", "embedding", "label")
    val out = Eval.silhouetteSampled(corpus, corpus, "vec_id",
      "embedding", "label")
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2))))
      .toMap
    // labels 0/1: a = 0 (identical twin), b = 1 (orthogonal) → s = 1
    assert(out(0) == ((2, 1.0)) && out(1) == ((2, 1.0)))
    // label 2 is a singleton: its probe has no same-cluster peer → skipped
    assert(!out.contains(2))
  }

  test("ndcgAtK: perfect retrieval scores 1; zero-relevant queries " +
      "report null ndcg") {
    val corpus = Seq(
      (1L, v(1, 0, 0), 0), (2L, v(0.9, 0.1, 0), 0), (3L, v(0.9, 0, 0.1), 0),
      (4L, v(0, 1, 0), 1), (5L, v(0, 0.9, 0.1), 1),
      (6L, v(0, 0, 1), 2)).toDF("vec_id", "embedding", "label")
    val out = Eval.ndcgAtK(corpus, corpus.filter(col("vec_id").isin(1L, 6L)),
      "vec_id", "embedding", "label", "vec_id", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // query 1: both same-label mates outrank every cross-cluster vector
    // (cos ≈ 0.99 vs ≤ 0.11) → the 2 relevant sit at ranks 1–2 = ideal
    val r1 = out(1L)
    assert(r1.getInt(1) == 2 && r1.getDouble(4) == 1.0,
      "perfect ranking must score ndcg exactly 1")
    assert(r1.getDouble(2) == r1.getDouble(3), "dcg == idcg when perfect")
    // query 6: no other label-2 vector → n_rel 0, null idcg/ndcg
    val r6 = out(6L)
    assert(r6.getInt(1) == 0 && r6.isNullAt(3) && r6.isNullAt(4))
  }

  test("knnCalibration: pure clusters land in the full-confidence bin " +
      "with zero gap; a mislabeled point dents that bin's accuracy by " +
      "exactly 1/n") {
    val cluster0 = (1L to 5L).map(i => (i, v(1, 0.01 * i, 0), 0))
    val cluster1 = (11L to 15L).map(i => (i, v(0, 1, 0.01 * (i - 10)), 1))
    // 16 sits in cluster 0's cone but carries label 9: its own k-NN vote
    // is unanimous label 0 → wrong prediction at full confidence
    val oddball = Seq((16L, v(1, 0.03, 0.001), 9))
    val corpus = (cluster0 ++ cluster1 ++ oddball)
      .toDF("vec_id", "embedding", "label")
    val out = Eval.knnCalibration(corpus, corpus, "vec_id", "embedding",
      "label", "vec_id", k = 3)
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    // knnClassify includes SELF: the oddball's own 3-NN vote is
    // {self-label 9 ×1, cluster-0 ×2} → wrong pred at 2 votes, and it
    // contaminates exactly one cluster-0 neighbor down to 2 votes too
    // → bin 2 = {oddball wrong, neighbor right}, bin 3 = the other 9
    assert(out.keySet == Set(2, 3))
    val (n2, conf2, acc2, gap2, contrib2) = out(2)
    assert(n2 == 2 && conf2 == math.rint(2.0 / 3 * 1e6) / 1e6 &&
      acc2 == 0.5)
    assert(gap2 == math.rint((2.0 / 3 - 0.5) * 1e6) / 1e6)
    assert(contrib2 == math.rint(2.0 / 11 * (2.0 / 3 - 0.5) * 1e6) / 1e6)
    val (n3, conf3, acc3, gap3, contrib3) = out(3)
    assert(n3 == 9 && conf3 == 1.0 && acc3 == 1.0 && gap3 == 0.0 &&
      contrib3 == 0.0, "the pure bin is perfectly calibrated")
  }
}
