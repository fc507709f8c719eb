package graft

import graft.engine.Relational

/** Hand-value pins for the q321-q323 wave: Wilson score interval,
  * delete-one-group jackknife ratio SE, Chapman capture-recapture.
  */
class UncertaintyWaveSpec extends SparkSpec {
  import spark.implicits._

  test("wilsonRateReport: hand 3/4 interval, k=0 floors at 0, k=n " +
      "caps at 1") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0),
      ("z", 0), ("z", 0), ("f", 1), ("f", 1)).toDF("g", "ok")
    val r = Relational.wilsonRateReport(df, Seq("g"), "ok")
      .collect().map(x => x.getString(0) -> x).toMap
    val a = r("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 3)
    assert(a.getDouble(3) == 0.75)
    // hand: lo = (1.2302 - 1.96*0.326955...) / 1.9604 ~ 0.300639
    assert(math.abs(a.getDouble(4) - 0.300639) < 1e-5, s"lo=${a.getDouble(4)}")
    assert(math.abs(a.getDouble(5) - 0.954413) < 1e-5, s"hi=${a.getDouble(5)}")
    // k = 0: the Wilson lower bound is exactly 0 (and clamped there)
    assert(r("z").getDouble(4) == 0.0 && r("z").getDouble(5) > 0.5)
    // k = n: upper bound 1, lower well below
    assert(r("f").getDouble(5) == 1.0 && r("f").getDouble(4) < 0.9)
  }

  test("jackknifeRatio: hand LOO spread, single group yields null SE") {
    // groups (y, x): A (10,2) B (20,2) C (30,2); theta = 60/6 = 10
    // LOO micro-ratios: 12.5e6, 10e6, 7.5e6 -> se = 2.886751
    val df = Seq(("A", 4L, 1L), ("A", 6L, 1L), ("B", 20L, 2L),
      ("C", 30L, 2L)).toDF("g", "y", "x")
    val r = Relational.jackknifeRatio(df, "g", "y", "x").collect().head
    assert(r.getInt(0) == 3 && r.getLong(1) == 60L && r.getLong(2) == 6L)
    assert(r.getLong(3) == 10000000L)
    assert(r.getDouble(4) == 2.886751, s"se=${r.getDouble(4)}")
    val one = Seq(("A", 10L, 2L)).toDF("g", "y", "x")
    val r1 = Relational.jackknifeRatio(one, "g", "y", "x").collect().head
    assert(r1.getInt(0) == 1 && r1.isNullAt(4))
  }

  test("captureRecapture: hand Chapman estimate and signed err_ppm") {
    // 10 entities; A sees 6, B sees 5, overlap 3
    // n_hat = (7*6)//4 - 1 = 9; err_ppm = -100000
    val rows = (1 to 10).map { i =>
      (i.toLong, if (i <= 6) 1 else 0, if (i >= 4 && i <= 8) 1 else 0)
    }
    val df = rows.toDF("id", "fa", "fb")
    val r = Relational.captureRecapture(df, "fa", "fb").collect().head
    assert(r.getLong(0) == 6 && r.getLong(1) == 5 && r.getLong(2) == 3)
    assert(r.getLong(3) == 9 && r.getLong(4) == 10)
    assert(r.getDouble(5) == -100000.0)
    // perfect overlap of equal detectors -> n_hat = population exactly
    val eq = (1 to 5).map(i => (i.toLong, 1, 1)).toDF("id", "fa", "fb")
    val re = Relational.captureRecapture(eq, "fa", "fb").collect().head
    assert(re.getLong(3) == 5 && re.getDouble(5) == 0.0)
  }
}
