package graft

import java.sql.Timestamp
import graft.engine.{Relational, Windows}

/** Hand-value pins for the q338-q340 wave: cohort LTV, Markov top-1
  * accuracy, Erlang-C.
  */
class OpsGrowthWaveSpec extends SparkSpec {
  import spark.implicits._

  test("cohortLtv: hand cohorts, cumulative per-user readout") {
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 10:00:00")
    val df = Seq((1L, t(1), 10L), (1L, t(3), 20L), (2L, t(1), 30L),
      (3L, t(3), 40L)).toDF("user_id", "ts", "v")
    val r = Windows.cohortLtv(df.repartition(3), "user_id", "ts", "v")
      .collect().map(x => (x.getDate(0).toString, x.getInt(1)) -> x).toMap
    // Jan-1 cohort (2 users): age 0 rev 40 -> 20/user; age 2 cum 60
    assert(r(("2024-01-01", 0)).getLong(4) == 40L)
    assert(r(("2024-01-01", 0)).getLong(5) == 20000000L)
    assert(r(("2024-01-01", 2)).getLong(4) == 60L)
    assert(r(("2024-01-01", 2)).getLong(5) == 30000000L)
    // Jan-3 cohort (1 user)
    assert(r(("2024-01-03", 0)).getLong(5) == 40000000L)
  }

  test("markovTopAccuracy: argmax next-state with lexico ties, " +
      "floored hit rate") {
    val tr = Seq(("A", "B", 3L), ("A", "C", 1L), ("B", "A", 2L),
      ("C", "A", 1L), ("C", "B", 1L)).toDF("from_state", "to_state", "n")
    val r = Windows.markovTopAccuracy(tr)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getString(1) == "B" && r("A").getLong(4) == 750000L)
    assert(r("B").getLong(4) == 1000000L)
    // tie at C: lexico-smaller next wins, acc = 1/2
    assert(r("C").getString(1) == "A" && r("C").getLong(4) == 500000L)
  }

  test("erlangCReport: hand M/M/2 at a = 1 erlang; unstable queue " +
      "is null") {
    val one = Seq(("g", 1)).toDF("grp", "x")
    val r = Relational.erlangCReport(one, Seq("grp"), c = 2,
      hours = 1.0, mu = 1.0).collect().head
    assert(r.getLong(1) == 1 && r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.5)
    // EC = 0.5 / (0.5 + 0.5*2) = 1/3
    assert(r.getDouble(4) == 0.333333, s"ec=${r.getDouble(4)}")
    val over = Seq(("g", 1), ("g", 2), ("g", 3)).toDF("grp", "x")
    val ro = Relational.erlangCReport(over, Seq("grp"), c = 2,
      hours = 1.0, mu = 1.0).collect().head
    assert(ro.getDouble(3) == 1.5 && ro.isNullAt(4))
  }
}
