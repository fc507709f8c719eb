package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames. Companion to the
  * pointer-jumping connected components in [[graft.llm.Dedup]]: that one
  * converges a partition (O(log n) rounds); these run a FIXED number of
  * synchronous value-propagation rounds.
  *
  * All rank arithmetic is SCALED-INTEGER (parts-per-million with explicit
  * floor division): an FP PageRank sums float contributions per node, and
  * FP addition is order-dependent — two runs (or two engines) shuffle-
  * reduce in different orders and disagree in the low bits, which is
  * exactly the q124/q154 rounding-trap class. Integer sums are exact and
  * commutative, so every engine that mirrors the formula lands on
  * identical ranks bit-for-bit.
  */
object Graph {

  /** PageRank, `iters` synchronous rounds, ranks in ppm of one unit
    * (rank₀ = 1,000,000 per node). Per round, each node sends
    * `rank DIV outdeg` along every out-edge and collects
    * `base + (dampPct · Σ incoming) DIV 100`, base =
    * `(100 − dampPct) · 10⁴`. Dangling nodes (no out-edges) keep
    * receiving but send nothing — their mass leaks, the standard
    * simplification when ranks are read as an ORDERING rather than a
    * probability (redistribution would add an all-nodes broadcast per
    * round for no ordering change).
    *
    * Scale shape: the edge list is joined to the degree frame ONCE
    * up-front (one shuffle on src, reused every round); each round is
    * one src-keyed join (rank is node-grain, co-partitioned) + one
    * dst-keyed aggregate — the minimal two-exchange round a synchronous
    * push model admits. At 1000-executor scale, persist `withDeg` and
    * localCheckpoint `rank` every few rounds (lineage doubles per round,
    * same discipline as the CC loop in `Dedup.duplicateClusters`).
    */
  def pageRankPpm(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampPct: Int = 85): DataFrame = {
    require(iters >= 1, "need at least one round")
    require(dampPct >= 0 && dampPct <= 100, "dampPct is a percentage")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
    val base = (100L - dampPct) * 10000L
    var rank = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 1 to iters) {
      val in = withDeg
        .join(rank.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("rank DIV outdeg").as("__c"))
        .groupBy("id").agg(sum(col("__c")).as("__s"))
      rank = nodes.join(in, Seq("id"), "left")
        .select(col("id"), (lit(base) +
          expr(s"($dampPct * coalesce(__s, CAST(0 AS BIGINT))) DIV 100"))
          .as("rank"))
    }
    rank
  }
}
