package graft

import graft.engine.Relational

/** Hand-value pins for the q330-q332 wave: HBOS outliers,
  * Nelson-Aalen, difference-in-differences.
  */
class OutlierCausalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("hbosOutliers: the thin-bin row tops the list with the exact " +
      "-ln score; ranking is the integer count product") {
    // one feature, 4 bins of width 4 on [0,16): 5 rows in bin 0, one
    // lone row (v=15) in bin 3
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L), (5L, 2L),
      (9L, 15L)).toDF("id", "f")
    val r = Relational.hbosOutliers(df.repartition(3), "id",
      Seq(("f", 0d, 16d, 4)), k = 2).collect()
    assert(r.length == 2)
    assert(r(0).getLong(0) == 9L && r(0).getLong(1) == 1L)
    assert(r(0).getDouble(2) == 1.791759)   // -ln(1/6)
    assert(r(1).getLong(0) == 1L)           // tie in bin 0 -> min id
    assert(r(1).getDouble(2) == 0.182322)   // -ln(5/6)
  }

  test("nelsonAalen: hand per-step hazards and the integer prefix " +
      "sum; censoring raises the risk set only") {
    val df = Seq(("A", 1, 1), ("A", 1, 1), ("A", 2, 1), ("A", 2, 0))
      .toDF("g", "step", "event")
    val r = Relational.nelsonAalen(df, Seq("g"), "step", "event")
      .collect().map(x => x.getInt(1) -> x).toMap
    // t=1: n_risk 4, d 2 -> h 500000; t=2: n_risk 2, d 1 -> h 500000
    assert(r(1).getLong(2) == 4 && r(1).getLong(3) == 2)
    assert(r(1).getLong(4) == 500000L && r(1).getLong(5) == 500000L)
    assert(r(2).getLong(2) == 2 && r(2).getLong(3) == 1)
    assert(r(2).getLong(4) == 500000L && r(2).getLong(5) == 1000000L)
  }

  test("didEffect: hand 2x2 means, zero-variance cells give se = 0 " +
      "and null z, a spread T-post cell gives z = did/se") {
    val flat = Seq((0, 0, 10L), (0, 0, 10L), (0, 1, 20L), (0, 1, 20L),
      (1, 0, 30L), (1, 0, 30L), (1, 1, 50L), (1, 1, 50L))
      .toDF("tr", "po", "v")
    val r = Relational.didEffect(flat, "tr", "po", "v").collect().head
    assert(r.getLong(0) == 2 && r.getLong(3) == 2)
    assert(r.getDouble(4) == 10.0)          // (50-30) - (20-10)
    assert(r.getDouble(5) == 0.0)
    assert(r.isNullAt(6), "zero spread -> z undefined")
    val spread = Seq((0, 0, 10L), (0, 0, 10L), (0, 1, 20L), (0, 1, 20L),
      (1, 0, 30L), (1, 0, 30L), (1, 1, 49L), (1, 1, 51L))
      .toDF("tr", "po", "v")
    val rs = Relational.didEffect(spread, "tr", "po", "v").collect().head
    assert(rs.getDouble(4) == 10.0 && rs.getDouble(5) == 1.0)
    assert(rs.getDouble(6) == 10.0)
    // a single-observation cell nulls the whole effect block
    val thin = Seq((0, 0, 10L), (0, 1, 20L), (0, 1, 22L),
      (1, 0, 30L), (1, 0, 31L), (1, 1, 50L), (1, 1, 52L))
      .toDF("tr", "po", "v")
    val rt = Relational.didEffect(thin, "tr", "po", "v").collect().head
    assert(rt.isNullAt(4) && rt.isNullAt(5) && rt.isNullAt(6))
  }
}
