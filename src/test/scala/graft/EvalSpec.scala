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

  test("rankBiasedOverlap: identical rankings score 1 - p^k, disjoint " +
      "rankings score 0, and a top-1 swap costs more than a tail swap") {
    val p = 0.9; val k = 5
    def ranking(ids: Seq[Long]) = ids.zipWithIndex
      .map { case (id, i) => (1L, id, i + 1) }
      .toDF("query_id", "neighbor_id", "rank")
    def rbo(a: Seq[Long], b: Seq[Long]): Double =
      Eval.rankBiasedOverlap(ranking(a), ranking(b), "query_id",
        "neighbor_id", "rank", p, k).collect().head.getDouble(2)
    val base = Seq(1L, 2L, 3L, 4L, 5L)
    val same = rbo(base, base)
    val wantSame = math.rint((1 - p) * Eval.rboWeights(p, k).sum * 1e6) / 1e6
    assert(same == wantSame && math.abs(same - (1 - math.pow(p, k))) < 1e-6,
      "identical rankings must score the full truncated mass 1 - p^k")
    assert(rbo(base, Seq(6L, 7L, 8L, 9L, 10L)) == 0.0)
    // swapping ranks 1↔2 hurts more than swapping 4↔5: top-weighted
    val headSwap = rbo(base, Seq(2L, 1L, 3L, 4L, 5L))
    val tailSwap = rbo(base, Seq(1L, 2L, 3L, 5L, 4L))
    assert(headSwap < tailSwap && tailSwap < same)
  }

  test("crossCosineMatches: duplicated probes flag their corpus twins, " +
      "orthogonal probes flag nothing, hot buckets are dropped whole") {
    // corpus 1 and 2 share probe 10's sign bucket (x > 0, y <= 0);
    // corpus 3 lives alone in the +y bucket
    val corpus = Seq((1L, v(1, 0, 0)), (2L, v(0.9, -0.1, 0)),
      (3L, v(0, 1, 0))).toDF("vec_id", "embedding")
    val probes = Seq((10L, v(1, 0, 0)), (11L, v(0, 0, 1)))
      .toDF("eval_id", "embedding")
    val anchors = Seq(Seq(1.0, 0, 0), Seq(0.0, 1, 0))
    val out = llm.Similarity.crossCosineMatches(corpus, probes, "vec_id",
      "eval_id", "embedding", anchors, minCos = 0.95, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // probe 10 duplicates corpus 1 (cos 1) and near-matches 2 (0.9939);
    // probe 11's all-zero-sign bucket holds no corpus vectors → no hits
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 10L), (2L, 10L)))
    assert(out.find(_._1 == 1L).get._3 == 1.0)
    // cap = 1: corpus bucket of {1, 2} exceeds it → dropped whole
    val capped = llm.Similarity.crossCosineMatches(corpus, probes,
      "vec_id", "eval_id", "embedding", anchors, minCos = 0.95,
      maxBucket = 1).collect()
    assert(capped.isEmpty, "saturated buckets must drop, not explode")
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
