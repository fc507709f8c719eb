package graft

import graft.engine.Relational

/** Hand-value pins for the q327-q329 wave: best-split stump, SMD
  * balance audit, partial correlation.
  */
class SplitBalanceWaveSpec extends SparkSpec {
  import spark.implicits._

  test("bestSplitStump: perfectly separable data finds the boundary " +
      "with full gain; a constant label ties to the smallest value") {
    val df = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("v", "lab")
    val r = Relational.bestSplitStump(df.repartition(3), "v", "lab")
      .collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 2)
    assert(r.getLong(2) == 2000000L)          // parent: (4+4)e6//4
    assert(r.getLong(3) == 2L)                // split at v <= 2
    assert(r.getLong(4) == 4000000L)          // pure halves: 2e6 + 2e6
    assert(r.getLong(5) == 2000000L)          // full Gini gain
    val const = Seq((5L, 1), (6L, 1), (9L, 1)).toDF("v", "lab")
    val rc = Relational.bestSplitStump(const, "v", "lab").collect().head
    assert(rc.getLong(3) == 5L && rc.getLong(5) == 0L)
  }

  test("smdBalance: hand two-arm means and sample variances; " +
      "singleton arm yields null") {
    // cov a: T {1,3} C {5,7}: smd = (2-6)/sqrt((2+2)/2) = -2.828427
    val df = Seq(("a", 1, 1L), ("a", 1, 3L), ("a", 0, 5L), ("a", 0, 7L),
      ("b", 1, 2L), ("b", 0, 4L), ("b", 0, 6L)).toDF("cov", "t", "v")
    val r = Relational.smdBalance(df, "cov", "t", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("a").getLong(1) == 2 && r("a").getLong(2) == 2)
    assert(r("a").getDouble(3) == -2.828427, s"smd=${r("a").getDouble(3)}")
    assert(r("b").isNullAt(3), "n_t = 1 arm must be null")
  }

  test("partialCorrelation: y = x keeps r_xy_z = 1 under an " +
      "uncorrelated z; a collinear z nulls the partial") {
    val df = Seq((1L, 1L, 1L), (2L, 2L, -1L), (3L, 3L, 1L),
      (4L, 4L, -1L)).toDF("x", "y", "z")
    val r = Relational.partialCorrelation(df, "x", "y", "z")
      .collect().head
    assert(r.getLong(0) == 4)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == -0.447214, s"r_xz=${r.getDouble(2)}")
    assert(r.getDouble(4) == 1.0, s"r_xy_z=${r.getDouble(4)}")
    // z == x: |r_xz| = 1 -> the partial is undefined (null), r_xy fine
    val coll = Seq((1L, 2L, 1L), (2L, 4L, 2L), (3L, 5L, 3L))
      .toDF("x", "y", "z")
    val rc = Relational.partialCorrelation(coll, "x", "y", "z")
      .collect().head
    assert(!rc.isNullAt(1) && rc.isNullAt(4))
  }
}
