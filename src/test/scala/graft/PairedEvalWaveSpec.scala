package graft

import graft.engine.Relational

/** Hand-value pins for the q397–q400 paired-evaluation wave: ROC AUC
  * (rank identity with ties), calibration bins (ECE + Brier exact
  * integer arithmetic), McNemar discordant pairs, Page's ordered
  * trend (perfect-trend z).
  */
class PairedEvalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("aucRoc: perfect separation 1.0, identical distributions 0.5, " +
      "mixed case with one tie 0.875 (num2 doubled-tie exact)") {
    val perfect = Seq((true, 3L), (true, 4L), (false, 1L), (false, 2L))
      .toDF("y", "v")
    val rp = Relational.aucRoc(perfect, "y", "v").head()
    assert(rp.getAs[Long]("n_pos") == 2L && rp.getAs[Long]("n_neg") == 2L)
    assert(rp.getAs[Long]("num2") == 8L)
    assert(math.abs(rp.getAs[Double]("auc") - 1.0) < 1e-9)

    val flat = Seq((true, 1L), (true, 2L), (false, 1L), (false, 2L))
      .toDF("y", "v")
    assert(math.abs(Relational.aucRoc(flat, "y", "v").head()
      .getAs[Double]("auc") - 0.5) < 1e-9)

    // pairs: (2>1)=1, (2=2)=.5, (3>1)=1, (3>2)=1 -> 3.5/4
    val mixed = Seq((true, 2L), (true, 3L), (false, 1L), (false, 2L))
      .toDF("y", "v")
    val rm = Relational.aucRoc(mixed, "y", "v").head()
    assert(rm.getAs[Long]("num2") == 7L)
    assert(math.abs(rm.getAs[Double]("auc") - 0.875) < 1e-9)
  }

  test("calibrationReport: bin edges (p=1.0 clamps to top bin), exact " +
      "DIV conf/acc/gap, ECE and Brier integer readouts") {
    val df = Seq((250000L, false), (250000L, true), (950000L, true),
      (1000000L, true)).toDF("p", "y")
    val out = Relational.calibrationReport(df, "p", "y", bins = 10)
      .collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(out.keySet == Set(2L, 9L))
    val b2 = out(2L)
    assert(b2.getAs[Long]("n") == 2L)
    assert(b2.getAs[Long]("conf_ppm") == 250000L)
    assert(b2.getAs[Long]("acc_ppm") == 500000L)
    assert(b2.getAs[Long]("gap_ppm") == 250000L)
    val b9 = out(9L) // (950000 + 1000000) DIV 2 = 975000, acc 10^6
    assert(b9.getAs[Long]("n") == 2L)
    assert(b9.getAs[Long]("conf_ppm") == 975000L)
    assert(b9.getAs[Long]("gap_ppm") == 25000L)
    // ECE = (2*250000 + 2*25000) DIV 4 = 137500
    assert(b2.getAs[Long]("ece_ppm") == 137500L)
    // Brier = (0.25^2 + 0.75^2 + 0.05^2 + 0) / 4 = 0.156875
    assert(b2.getAs[Long]("brier_micro") == 156875L)
  }

  test("mcnemarTest: balanced discordance chi2=0; 3-vs-1 discordance " +
      "chi2=1.0 with continuity correction 0.25") {
    val bal = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    val rb = Relational.mcnemarTest(bal, "a", "b").head()
    assert(rb.getAs[Long]("n_a_only") == 1L &&
      rb.getAs[Long]("n_b_only") == 1L)
    assert(rb.getAs[Double]("chi2") == 0.0)

    val skew = Seq((true, false), (true, false), (true, false),
      (false, true)).toDF("a", "b")
    val rs = Relational.mcnemarTest(skew, "a", "b").head()
    assert(math.abs(rs.getAs[Double]("chi2") - 1.0) < 1e-9)
    assert(math.abs(rs.getAs[Double]("chi2_cc") - 0.25) < 1e-9)
  }

  test("pageTrendTest: perfect ascending trend over b=2 blocks, k=3 " +
      "gives L2=56 and z=2; anti-trend flips the sign") {
    val up = (1 to 2).flatMap { b =>
      Seq((s"b$b", "t1", 1L), (s"b$b", "t2", 2L), (s"b$b", "t3", 3L))
    }.toDF("b", "t", "v")
    val ru = Relational.pageTrendTest(up, "b", "t", "v").head()
    assert(ru.getAs[Int]("k") == 3 && ru.getAs[Long]("b") == 2L)
    assert(ru.getAs[Long]("l2_stat") == 56L)
    assert(math.abs(ru.getAs[Double]("z") - 2.0) < 1e-9)

    val down = (1 to 2).flatMap { b =>
      Seq((s"b$b", "t1", 3L), (s"b$b", "t2", 2L), (s"b$b", "t3", 1L))
    }.toDF("b", "t", "v")
    val rd = Relational.pageTrendTest(down, "b", "t", "v").head()
    assert(rd.getAs[Long]("l2_stat") == 40L)
    assert(math.abs(rd.getAs[Double]("z") + 2.0) < 1e-9)
  }
}
