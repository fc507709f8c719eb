package graft

import org.apache.spark.sql.functions._
import graft.engine.{Relational, Windows}

/** Hand-value pins for the q413–q416 wave: stratified ATE (per-stratum
  * round-double diffs, single-arm strata excluded), burstiness
  * (metronome pins −1), PACF (degenerate-denominator nulls + formula
  * parity on a mixed series), Benjamini–Yekutieli (harmonic-shrunk
  * critical values against the known BH walk).
  */
class CausalTemporalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedAte: weighted per-stratum diffs, single-arm strata " +
      "flagged null and excluded from the weight") {
    val df = Seq(
      ("A", true, 10L), ("A", true, 20L), ("A", false, 0L),
      ("B", true, 2L), ("B", false, 4L),
      ("C", true, 99L)) // no control arm -> excluded
      .toDF("s", "tr", "y")
    val out = Relational.stratifiedAte(df, "s", "tr", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("A").getAs[Long]("diff_micro") == 15000000L)
    assert(out("B").getAs[Long]("diff_micro") == -2000000L)
    assert(out("C").isNullAt(out("C").fieldIndex("diff_micro")))
    // ate = round(3*15e6/5) + round(2*(-2e6)/5) = 9e6 - 8e5
    assert(out("A").getAs[Long]("ate_micro") == 8200000L)
  }

  test("interarrivalBurstiness: a metronome pins B = -1; a bursty " +
      "tail matches the closed form") {
    val met = (1 to 5).map(i => ("m", 1L, i.toLong * 1000000, i.toLong))
      .toDF("g", "u", "tsus", "e")
      .select(col("g"), col("u"),
        timestamp_micros(col("tsus")).as("ts"), col("e"))
    val rm = Windows.interarrivalBurstiness(met, "g", "u", "ts",
      Seq("e")).head()
    assert(rm.getAs[Long]("n_gaps") == 4L)
    assert(rm.getAs[Double]("b_index") == -1.0)

    // gaps 1,1,1,97 us: D = 4*9412 - 100^2
    val burst = Seq(0L, 1L, 2L, 3L, 100L).zipWithIndex
      .map { case (t, i) => ("b", 1L, t, i.toLong) }
      .toDF("g", "u", "tsus", "e")
      .select(col("g"), col("u"),
        timestamp_micros(col("tsus")).as("ts"), col("e"))
    val rb = Windows.interarrivalBurstiness(burst, "g", "u", "ts",
      Seq("e")).head()
    val d = math.sqrt(4.0 * 9412 - 10000)
    val exp = math.round((d - 100) / (d + 100) * 1e6) / 1e6
    assert(math.abs(rb.getAs[Double]("b_index") - exp) < 1e-9)
  }

  test("pacf3: perfectly correlated lags null-out the recursion " +
      "denominator; a mixed series matches the Durbin-Levinson " +
      "closed form on its own rounded ACFs") {
    val ramp = (0L until 12L).map(t => ("k", t, t)).toDF("k", "t", "x")
    val rr = Windows.pacf3(ramp, Seq("k"), Seq("t"), "x").head()
    assert(rr.getAs[Double]("r1") == 1.0)
    assert(rr.isNullAt(rr.fieldIndex("pacf2")))

    val xs = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L, 8L)
    val df = xs.zipWithIndex.map { case (x, t) => ("k", t.toLong, x) }
      .toDF("k", "t", "x")
    val r = Windows.pacf3(df, Seq("k"), Seq("t"), "x").head()
    def acf(k: Int): Double = {
      val pairs = xs.drop(k).zip(xs.dropRight(k))
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum.toDouble
      val sy = pairs.map(_._2).sum.toDouble
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      math.round((n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e6) / 1e6
    }
    val (r1, r2, r3) = (acf(1), acf(2), acf(3))
    assert(r.getAs[Double]("r1") == r1)
    assert(r.getAs[Double]("r2") == r2)
    assert(r.getAs[Double]("r3") == r3)
    val p22 = math.round((r2 - r1 * r1) / (1 - r1 * r1) * 1e6) / 1e6
    assert(r.getAs[Double]("pacf2") == p22)
    val p21 = r1 * (1 - p22)
    val p33 = math.round((r3 - p21 * r2 - p22 * r1) /
      (1 - p21 * r1 - p22 * r2) * 1e6) / 1e6
    assert(r.getAs[Double]("pacf3") == p33)
  }

  test("byFdr: harmonic-number shrinkage (exact 10^6 DIV i sum) " +
      "against the known step-up walk") {
    val df = Seq((1L, 0.01), (2L, 0.02), (3L, 0.5), (4L, 0.9))
      .toDF("id", "p")
    val out = Relational.byFdr(df, "id", "p", alphaPct = 20)
      .collect().map(r => r.getLong(0) -> r).toMap
    // h_micro = 1000000+500000+333333+250000 = 2083333
    // crit(rank) = rank*20*10000/(4*2083333)
    val crit1 = math.round(1.0 * 20 * 10000 / (4.0 * 2083333) * 1e6) / 1e6
    assert(out(1L).getAs[Double]("crit") == crit1)
    assert(out(1L).getAs[Boolean]("discovery"))
    assert(out(2L).getAs[Boolean]("discovery"))
    assert(!out(3L).getAs[Boolean]("discovery"))
    assert(!out(4L).getAs[Boolean]("discovery"))
  }
}
