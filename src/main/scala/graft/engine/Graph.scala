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
    * up-front (one shuffle on src) and PERSISTED together with the node
    * list — every round's plan embeds the previous rounds' lineage, so
    * without the cache the edge derivation (often a join + distinct over
    * the fact tables) re-executes once per round per ancestor
    * (measured: 6.7 s → 2.x s for 3 rounds over a 485k-edge graph at
    * sf0.1). Each round is then one src-keyed join (rank is node-grain)
    * + one dst-keyed aggregate — the minimal two-exchange round a
    * synchronous push model admits. The final rank is materialized with
    * an eager localCheckpoint so both caches can be RELEASED before
    * returning (same persist-once/checkpoint/release discipline as
    * `Dedup.fuzzyDuplicates`); it also truncates the iters-deep lineage
    * for whatever runs downstream.
    */
  def pageRankPpm(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampPct: Int = 85): DataFrame = {
    require(iters >= 1, "need at least one round")
    require(dampPct >= 0 && dampPct <= 100, "dampPct is a percentage")
    // e is read four times just to BUILD the two loop frames (src/dst
    // union for nodes, edge+degree for withDeg) — cache it through the
    // build, released with the rest
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    // both loop-invariant frames are persisted ALREADY PARTITIONED on
    // their join keys, so each round's src-join and id-join read the
    // cache without a fresh exchange on the big side
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .repartition(col("id")).persist()
    val withDeg = e.join(
      e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src")).persist()
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
    val out = rank.localCheckpoint(true)
    withDeg.unpersist(false)
    nodes.unpersist(false)
    e.unpersist(false)
    out
  }
}
