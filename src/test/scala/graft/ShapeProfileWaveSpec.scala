package graft

import org.apache.spark.sql.functions._
import graft.engine.Relational

/** Hand-value pins for the q421–q424 wave: Gumbel block-maxima fit
  * (two-block closed form), SAX motifs (alternating segments spell
  * ad/da), matrix profile (planted motif reads zero), KDE grid (exact
  * kernel micro terms at the probe points).
  */
class ShapeProfileWaveSpec extends SparkSpec {
  import spark.implicits._

  test("gumbelBlockMaxima: two-block moments match the closed form") {
    val df = Seq(("d1", 4L), ("d1", 10L), ("d2", 20L), ("d2", 3L))
      .toDF("blk", "x")
    val r = Relational.gumbelBlockMaxima(df, "blk", "x", returnT = 30)
      .head()
    assert(r.getAs[Long]("n_blocks") == 2L)
    assert(r.getAs[Long]("max_of_max") == 20L)
    // maxima {10, 20}: sigma = 5, beta = 5*sqrt(6)/pi
    val beta = math.round(math.sqrt(100.0) / 2 * math.sqrt(6.0) /
      math.Pi * 1e6) / 1e6
    assert(r.getAs[Double]("beta") == beta)
    val mu = math.round((15.0 - 0.5772156649015329 * beta) * 1e6) / 1e6
    assert(r.getAs[Double]("mu") == mu)
    val rl = math.round((mu - beta *
      math.log(-math.log(1 - 1d / 30))) * 1e6) / 1e6
    assert(r.getAs[Double]("rl") == rl)
  }

  test("saxMotifs: alternating low/high segments spell ad/da words") {
    val xs = Seq(0L, 0L, 10L, 10L, 0L, 0L, 10L, 10L)
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    val out = Relational.saxMotifs(df, "t", "x", segLen = 2, wordLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // z = ±1 -> symbols a/d; words over segs (a,d,a,d): ad, da, ad
    assert(out == Map("ad" -> 2L, "da" -> 1L))
  }

  test("matrixProfile: a planted exact repeat reads a zero-distance " +
      "pair outside the exclusion zone") {
    val xs = Seq(1L, 2L, 3L, 4L, 9L, 1L, 2L, 3L, 4L)
    val df = xs.zipWithIndex.map { case (x, t) => (t.toLong, x) }
      .toDF("t", "x")
    val out = Relational.matrixProfile(df, "t", "x", m = 4,
        exclusion = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("nn_t") == 5L)
    assert(out(0L).getAs[Long]("dist2") == 0L)
    assert(out(5L).getAs[Long]("nn_t") == 0L)
    assert(out(5L).getAs[Long]("dist2") == 0L)
    // window 1 = [2,3,4,9]: nearest legal neighbor is window 5
    assert(out(1L).getAs[Long]("nn_t") == 5L)
    assert(out(1L).getAs[Long]("dist2") == 28L)
  }

  test("kdeGrid: exact kernel micro terms at and away from the mass") {
    val df = Seq(100L, 100L).toDF("x")
    val out = Relational.kdeGrid(df, "x", Seq(100L, 150L),
        bandwidth = 25.0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(100L).getAs[Long]("kernel_sum_micro") == 2000000L)
    val d100 = math.round(2.0 / (2 * 25.0 * math.sqrt(2 * math.Pi)) *
      1e9) / 1e9
    assert(out(100L).getAs[Double]("density") == d100)
    val term = math.round(math.exp(-(50.0 / 25) * (50.0 / 25) / 2) * 1e6)
    assert(out(150L).getAs[Long]("kernel_sum_micro") == 2 * term)
  }

  test("maxSeries structural guard: an over-long series fails loudly " +
      "before the quadratic scan (saxMotifs / matrixProfile)") {
    val big = spark.range(0, 12).select(col("id").as("t"),
      (col("id") % 3).as("x"))
    val e1 = intercept[IllegalArgumentException] {
      Relational.saxMotifs(big, "t", "x", segLen = 2, wordLen = 2,
        maxSeries = 10)
    }
    assert(e1.getMessage.contains("maxSeries=10"))
    val e2 = intercept[IllegalArgumentException] {
      Relational.matrixProfile(big, "t", "x", m = 4, exclusion = 2,
        maxSeries = 10)
    }
    assert(e2.getMessage.contains("maxSeries=10"))
    // at the cap boundary the op still runs (guard is > , not >=)
    assert(Relational.saxMotifs(big, "t", "x", 2, 2, maxSeries = 12)
      .count() >= 1)
  }
}
