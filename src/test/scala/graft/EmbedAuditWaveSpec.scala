package graft

import graft.llm.Similarity

/** Hand-value pins for the q344-q345 wave: isotropy concentration,
  * hubness histogram.
  */
class EmbedAuditWaveSpec extends SparkSpec {
  import spark.implicits._

  test("isotropyReport: collapsed corpus reads 1, centered reads 0, " +
      "orthogonal halves read 1/2") {
    val collapsed = Seq.fill(4)(Seq(1f, 0f)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rc = Similarity.isotropyReport(collapsed, "v").collect().head
    assert(rc.getLong(0) == 4 && rc.getInt(1) == 2)
    assert(rc.getLong(2) == 1000000L && rc.getDouble(3) == 1.0)
    val centered = Seq((1L, Seq(1f, 0f)), (2L, Seq(-1f, 0f)))
      .toDF("id", "v")
    val rz = Similarity.isotropyReport(centered, "v").collect().head
    assert(rz.getLong(2) == 0L && rz.getDouble(3) == 0.0)
    val ortho = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f))).toDF("id", "v")
    val ro = Similarity.isotropyReport(ortho.repartition(2), "v")
      .collect().head
    assert(ro.getLong(2) == 500000L && ro.getDouble(3) == 0.5)
  }

  test("hubnessReport: hand k-occurrence histogram from two probe " +
      "clusters") {
    val corpus = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)),
      (2L, Seq(0f, 1f)), (3L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val probes = corpus.filter($"vec_id" === 0L || $"vec_id" === 2L)
    // k=2: each probe's list = its own cluster -> every point hit once
    val r2 = Similarity.hubnessReport(corpus, probes, "vec_id",
        "embedding", "vec_id", k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r2 == Map(1L -> 4L))
    // k=3: the cos-0 tie breaks to the smallest id -> v0 and v2 are
    // hit twice, v1 and v3 once
    val r3 = Similarity.hubnessReport(corpus, probes, "vec_id",
        "embedding", "vec_id", k = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r3 == Map(1L -> 2L, 2L -> 2L))
  }
}
