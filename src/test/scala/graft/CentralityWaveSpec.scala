package graft

import org.apache.spark.sql.functions._
import graft.engine.Graph

/** Hand-value pins for the q381–q384 landmark-centrality wave:
  * multi-source BFS distances, Wasserman–Faust closeness, harmonic
  * centrality, the hop histogram, and Adamic–Adar — on graphs small
  * enough to verify every number by hand (path, square-with-chords).
  */
class CentralityWaveSpec extends SparkSpec {
  import spark.implicits._

  private def pathEdges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    .toDF("a", "b")

  test("multiSourceBfs: path graph distances from one seed, horizon " +
      "cuts at maxHops, two seeds stay independent") {
    val bfs = Graph.multiSourceBfs(pathEdges, "a", "b",
      Seq(1L).toDF("n"), "n", maxHops = 2)
    val got = bfs.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2))).toSet
    assert(got == Set((1L, 1L, 0), (1L, 2L, 1), (1L, 3L, 2)))

    val two = Graph.multiSourceBfs(pathEdges, "a", "b",
      Seq(1L, 5L).toDF("n"), "n", maxHops = 4)
    // undirected: seed 5 reaches back to 1; min-hop per (seed, node)
    assert(two.filter(col("seed") === 5L && col("id") === 1L)
      .head().getInt(2) == 4)
    assert(two.count() == 10)
  }

  test("closenessFromBfs + harmonicFromBfs: hand values on the path") {
    val bfs = Graph.multiSourceBfs(pathEdges, "a", "b",
      Seq(1L).toDF("n"), "n", maxHops = 2)
    val c = Graph.closenessFromBfs(bfs, nNodes = 5L).head()
    // r=3, sum=3: (3-1)^2 * 1e6 DIV ((5-1)*3) = 4e6 DIV 12 = 333333
    assert(c.getAs[Long]("n_reached") == 3L)
    assert(c.getAs[Long]("sum_hops") == 3L)
    assert(c.getAs[Long]("closeness_micro") == 333333L)
    val h = Graph.harmonicFromBfs(bfs).head()
    // 1e6/1 + 1e6/2 = 1,500,000
    assert(h.getAs[Long]("harmonic_micro") == 1500000L)
  }

  test("hopHistogram: per-hop counts and cumulative ppm on the path") {
    val bfs = Graph.multiSourceBfs(pathEdges, "a", "b",
      Seq(1L).toDF("n"), "n", maxHops = 2)
    val rows = Graph.hopHistogram(bfs).orderBy("hop").collect()
    assert(rows.map(_.getAs[Long]("n_pairs")).toSeq == Seq(1L, 1L, 1L))
    assert(rows.map(_.getAs[Long]("cum_ppm")).toSeq ==
      Seq(333333L, 666666L, 1000000L))
  }

  test("adamicAdar: square graph — both diagonals scored via two " +
      "degree-2 pivots, adjacent pairs excluded") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val got = Graph.adamicAdar(sq, "a", "b", minCommon = 2)
      .orderBy("a", "b").collect()
    assert(got.length == 2)
    val term = math.round(1e6 / math.log(2.0)) // 1442695
    got.foreach { r =>
      assert(r.getAs[Long]("common") == 2L)
      assert(r.getAs[Long]("aa_micro") == 2L * term)
    }
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 3L), (2L, 4L)))
  }

  test("adamicAdar downweights high-degree pivots vs resourceAllocation " +
      "ordering agreement on a hub-vs-pair graph") {
    // z=100 is a hub (deg 4) shared by (1,2); z=200 (deg 2) shared by (3,4)
    val g = Seq((1L, 100L), (2L, 100L), (5L, 100L), (6L, 100L),
      (3L, 200L), (4L, 200L)).toDF("a", "b")
    val aa = Graph.adamicAdar(g, "a", "b", minCommon = 1)
      .select(col("a"), col("b"), col("aa_micro")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Long]("aa_micro")))
      .toMap
    // hub pair scores 1e6/ln4, tight pair 1e6/ln2 — tight wins
    assert(aa((3L, 4L)) > aa((1L, 2L)))
    assert(aa((1L, 2L)) == math.round(1e6 / math.log(4.0)))
    assert(aa((3L, 4L)) == math.round(1e6 / math.log(2.0)))
  }
}
