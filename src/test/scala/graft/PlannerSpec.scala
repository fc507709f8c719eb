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

  test("CDS request builder: datasets, payload fields, area expansion") {
    val g = Planner.RequestGroup("2020", Seq("03"), Seq("07"),
      Seq("13:00", "14:00"))
    val hourly = Planner.buildEra5Request(g, Seq(45.5, -73.5),
      Seq("2m_temperature", "total_precipitation"), monthly = false)
    assert(hourly.dataset == "reanalysis-era5-single-levels")
    val hm = hourly.payload.toMap
    assert(hm("product_type") == Right(Seq("reanalysis")))
    assert(hm("year") == Right(Seq("2020")) && hm("day") == Right(Seq("07")))
    // 2-point coords expand to a degenerate [N, W, S, E] box
    assert(hm("area") == Right(Seq("45.5", "-73.5", "45.5", "-73.5")))
    assert(hm("data_format") == Left("netcdf") &&
      hm("download_format") == Left("zip"))
    val monthly = Planner.buildEra5Request(g, Seq(50.0, -80.0, 40.0, -70.0),
      Seq("2m_temperature"), monthly = true)
    assert(monthly.dataset == "reanalysis-era5-single-levels-monthly-means")
    val mm = monthly.payload.toMap
    assert(mm("product_type") ==
      Right(Seq("monthly_averaged_reanalysis_by_hour_of_day")))
    assert(!mm.contains("day"))
    val co2 = Planner.buildCo2Request("CO2_OBS4MIPS")
    assert(co2.dataset == "satellite-carbon-dioxide" &&
      co2.filename == "CO2_OBS4MIPS.zip")
    intercept[IllegalArgumentException](Planner.area(Seq(1.0, 2.0, 3.0)))
  }

  test("filename cascade mirrors the reference's six cases") {
    val allH = (0 until 24).map(h => f"$h%02d:00")
    val allM = (1 to 12).map(m => f"$m%02d")
    val allD31 = (1 to 31).map(d => f"$d%02d")
    def f(y: Seq[String], m: Seq[String], d: Seq[String], t: Seq[String]) =
      Planner.requestFilename(y, m, d, t)
    assert(f(Seq("2020"), allM, allD31, allH) == "ERA5_2020_full-year.zip")
    assert(f(Seq("2019", "2021"), allM, allD31, allH) ==
      "ERA5_2019to2021_full-years.zip")
    assert(f(Seq("2020"), Seq("02"), (1 to 29).map(d => f"$d%02d"), allH) ==
      "ERA5_2020-02_full-month.zip")
    assert(f(Seq("2020"), Seq("03"), Seq("07"), allH) ==
      "ERA5_2020-03-07_full-day.zip")
    assert(f(Seq("2020"), Seq("03"), Seq("07", "09"), Seq("13:00")) ==
      "ERA5_2020-03_days07to09.zip")
    assert(f(Seq("2020"), Seq("03"), Seq("07"), Seq("13:00", "15:00")) ==
      "ERA5_2020-03-07T13:00to15:00.zip")
    assert(f(Seq("2020"), Seq("03"), Seq("07"), Seq("13:00")) ==
      "ERA5_2020-03-07T13:00.zip")
  }

  test("zip extraction: per-stem layout, delete-after, slip guard") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val dir = java.nio.file.Files.createTempDirectory("graft_zip").toString
    def mkZip(name: String, entries: Seq[(String, String)]): String = {
      val p = s"$dir/$name"
      val z = new ZipOutputStream(new java.io.FileOutputStream(p))
      entries.foreach { case (n, content) =>
        z.putNextEntry(new ZipEntry(n))
        z.write(content.getBytes("UTF-8")); z.closeEntry()
      }
      z.close(); p
    }
    mkZip("region_A.zip", Seq("a.nc" -> "alpha", "sub/b.nc" -> "beta"))
    mkZip("region_B.zip", Seq("c.tif" -> "gamma"))
    val out = graft.engine.Ingest.extractAll(dir, s"$dir/unzipped",
      deleteZips = true)
    assert(out.keySet == Set("region_A", "region_B"))
    assert(out("region_A").size == 2)
    assert(java.nio.file.Files.readString(java.nio.file.Paths.get(
      s"$dir/unzipped/region_A/sub/b.nc")) == "beta")
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/region_A.zip"))) // deleted
    val evil = mkZip("evil.zip", Seq("../escape.txt" -> "bad"))
    intercept[IllegalArgumentException](
      graft.engine.Ingest.unzip(evil, s"$dir/safe"))
  }
}
