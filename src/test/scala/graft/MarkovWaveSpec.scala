package graft

import java.sql.Timestamp
import graft.engine.Windows

/** Hand-value pins for the q361-q362 wave: absorption probability and
  * stationary distribution over the empirical transition chain.
  */
class MarkovWaveSpec extends SparkSpec {
  import spark.implicits._

  // chain: view->click (p=1e6), click->purchase (666666),
  // click->view (333333)
  private def fixture = Seq(
    (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"),
    (1L, ts(3), 3L, "purchase"),
    (2L, ts(1), 4L, "view"), (2L, ts(2), 5L, "click"),
    (2L, ts(3), 6L, "view"),
    (3L, ts(1), 7L, "click"), (3L, ts(2), 8L, "purchase")
  ).toDF("user_id", "ts", "event_id", "event_type")

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:0$m:00")

  test("absorptionPpm: exact two-step and five-step ppm; target " +
      "clamped to 1e6") {
    val a2 = Windows.absorptionPpm(fixture, "user_id", "ts",
        "event_type", Seq("event_id"), "purchase", steps = 2)
      .as[(String, Long)].collect().toMap
    assert(a2 == Map("purchase" -> 1000000L, "click" -> 666666L,
      "view" -> 666666L))
    val a5 = Windows.absorptionPpm(fixture, "user_id", "ts",
        "event_type", Seq("event_id"), "purchase", steps = 5)
      .as[(String, Long)].collect().toMap
    assert(a5("purchase") == 1000000L)
    assert(a5("click") == 962961L && a5("view") == 888887L)
    // monotone in steps
    assert(a5("view") > a2("view"))
  }

  test("absorptionPpm: unreachable target reports 0 everywhere else") {
    val a = Windows.absorptionPpm(fixture, "user_id", "ts",
        "event_type", Seq("event_id"), "signup", steps = 3)
      .as[(String, Long)].collect().toMap
    assert(a.values.forall(_ == 0L) && !a.contains("signup"))
  }

  test("stationaryPpm: one exact round from the uniform start; " +
      "absorbing-state mass drains (documented in-sample semantics)") {
    val p1 = Windows.stationaryPpm(fixture, "user_id", "ts",
        "event_type", Seq("event_id"), steps = 1)
      .as[(String, Long)].collect().toMap
    // pi0 = 333333 each; view <- click*333333; click <- view*1e6;
    // purchase <- click*666666
    assert(p1 == Map("view" -> 111110L, "click" -> 333333L,
      "purchase" -> 222221L))
  }
}
