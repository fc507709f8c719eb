package graft

import java.time.LocalDateTime
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Planner

/** OP-MISC-1 planner properties (SURVEY §5.3): hourly-mode plans cover
  * EXACTLY the requested hour set with no overlap, full months collapse.
  */
class PlannerSpec extends AnyFunSuite {

  private def explodeHours(gs: Seq[Planner.RequestGroup]): Seq[(Int, Int, Int, Int)] =
    for {
      g <- gs; m <- g.months; d <- g.days; h <- g.hours
    } yield (g.year.toInt, m.toInt, d.toInt, h.take(2).toInt)

  private def expectedHours(start: LocalDateTime,
      end: LocalDateTime): Seq[(Int, Int, Int, Int)] =
    Iterator.iterate(start)(_.plusHours(1)).takeWhile(!_.isAfter(end))
      .map(t => (t.getYear, t.getMonthValue, t.getDayOfMonth, t.getHour))
      .toSeq

  test("hourly: mid-month to mid-month covers exact hour set, no overlap") {
    val s = LocalDateTime.of(2020, 2, 15, 5, 0)
    val e = LocalDateTime.of(2020, 5, 10, 17, 0)
    val got = explodeHours(Planner.requestGroups(s, e, monthly = false))
    assert(got.size == got.distinct.size, "overlapping hours")
    assert(got.toSet == expectedHours(s, e).toSet)
  }

  test("hourly: full months collapse to whole-month groups") {
    val gs = Planner.requestGroups(LocalDateTime.of(2020, 3, 1, 0, 0),
      LocalDateTime.of(2020, 4, 30, 23, 0), monthly = false)
    assert(gs.size == 2)
    assert(gs.forall(_.hours.size == 24))
    assert(gs.map(_.days.size) == Seq(31, 30))
  }

  test("hourly property: random ranges always cover exactly") {
    val gen = for {
      h0 <- Gen.choose(0L, 24L * 900)
      len <- Gen.choose(0L, 24L * 200)
    } yield {
      val s = LocalDateTime.of(2019, 1, 1, 0, 0).plusHours(h0)
      (s, s.plusHours(len))
    }
    val cases = Gen.listOfN(25, gen).pureApply(Gen.Parameters.default, Seed(7L))
    cases.foreach { case (s, e) =>
      val got = explodeHours(Planner.requestGroups(s, e, monthly = false))
      assert(got.size == got.distinct.size, s"overlap for [$s, $e]")
      assert(got.toSet == expectedHours(s, e).toSet, s"coverage for [$s, $e]")
    }
  }

  test("monthly: full years emit one group per year") {
    val gs = Planner.requestGroups(LocalDateTime.of(2018, 1, 1, 0, 0),
      LocalDateTime.of(2020, 12, 31, 23, 0), monthly = true)
    assert(gs.size == 3)
    assert(gs.forall(g => g.months.size == 12 && g.days.size == 31))
    assert(gs.map(_.year) == Seq("2018", "2019", "2020"))
  }

  test("monthly: partial range emits one group per contained month") {
    val gs = Planner.requestGroups(LocalDateTime.of(2019, 3, 1, 0, 0),
      LocalDateTime.of(2020, 11, 30, 23, 0), monthly = true)
    assert(gs.size == 21) // mar 2019 .. nov 2020
    assert(gs.head.days.size == 31) // march
    assert(gs(1).days.size == 30)   // april
    assert(gs(11).days.size == 29)  // feb 2020 (leap)
  }
}
