package graft

import graft.engine.Relational

/** Hand-value pins for the q336-q337 wave: Wald IV, RMST. */
class CausalSurvivalWaveSpec extends SparkSpec {
  import spark.implicits._

  test("ivWaldEffect: hand ITT/first-stage/Wald; equal take-up rates " +
      "null the Wald but keep the ITT") {
    val units = Seq((1, 1, 10L), (1, 0, 0L), (0, 0, 0L), (0, 0, 2L))
      .toDF("z", "dk", "y")
    val r = Relational.ivWaldEffect(units, "z", "dk", "y")
      .collect().head
    assert(r.getLong(0) == 2 && r.getLong(1) == 2)
    assert(r.getLong(2) == 1 && r.getLong(3) == 0)
    assert(r.getDouble(4) == 4.0)     // itt = 5 - 1
    assert(r.getDouble(5) == 0.5)     // first stage
    assert(r.getDouble(6) == 8.0)     // wald = itt / fs
    val weak = Seq((1, 1, 10L), (1, 0, 0L), (0, 1, 5L), (0, 0, 1L))
      .toDF("z", "dk", "y")
    val rw = Relational.ivWaldEffect(weak, "z", "dk", "y")
      .collect().head
    assert(!rw.isNullAt(4) && rw.isNullAt(6), "weak instrument -> null")
  }

  test("rmst: hand step areas, horizon caps, pre-first-event head " +
      "segment at survival 1") {
    // km-shaped frame: only (group, step, survival) are read
    val km = Seq(("A", 1, 4L, 2L, 0.5, 0.5), ("A", 3, 2L, 1L, 0.5, 0.25),
      ("B", 7, 2L, 1L, 0.5, 0.5))
      .toDF("g", "step", "n_risk", "d", "factor", "survival")
    val r5 = Relational.rmst(km, Seq("g"), tau = 5)
      .collect().map(x => x.getString(0) -> x).toMap
    // A: 1*1.0 + 2*0.5 + 2*0.25 = 2.5
    assert(r5("A").getLong(2) == 2500000L && r5("A").getDouble(3) == 2.5)
    // B: first event at 7 > tau -> full horizon survives
    assert(r5("B").getLong(2) == 5000000L && r5("B").getDouble(3) == 5.0)
    val r2 = Relational.rmst(km, Seq("g"), tau = 2)
      .collect().map(x => x.getString(0) -> x).toMap
    // A: 1*1.0 + 1*0.5 = 1.5 (the t=3 step is past the horizon)
    assert(r2("A").getLong(2) == 1500000L && r2("A").getDouble(3) == 1.5)
  }
}
