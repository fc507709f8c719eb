package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.engine.{AggSchema, Windows}

/** OP-AGG-2 resample semantics (incl. the last-wins RH_mean quirk), OP-WIN-1
  * null alignment, OP-AGG-3 trim + keyCols.
  */
class AggWindowsSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("resample daily: RH+VPD both present → ONE RH_mean carrying VPD's mean") {
    import spark.implicits._
    val df = Seq(
      (ts("2020-01-01 00:00:00"), 10.0, 20.0, 50.0),
      (ts("2020-01-01 01:00:00"), 12.0, 30.0, 70.0))
      .toDF("valid_time", "TA", "RH", "VPD")
    val out = AggSchema.resample(df, AggSchema.Daily, "valid_time", Nil)
    assert(out.columns.count(_ == "RH_mean") == 1)
    val row = out.collect()(0)
    // last-wins: RH_mean is VPD's mean (60), RH_max is still RH's (30)
    assert(row.getAs[Double]("RH_mean") == 60.0)
    assert(row.getAs[Double]("RH_max") == 30.0)
    assert(row.getAs[Double]("VPD_max") == 70.0)
    // and the frame is writable (no duplicate columns)
    out.write.mode("overwrite")
      .parquet(s"${sys.props("java.io.tmpdir")}/graft_test_rhvpd")
  }

  test("resample: SWC delta = last-by-time − first-by-time, order-free") {
    import spark.implicits._
    val df = Seq(
      (ts("2020-01-01 02:00:00"), 8.0),
      (ts("2020-01-01 00:00:00"), 3.0),
      (ts("2020-01-01 01:00:00"), 100.0))
      .toDF("valid_time", "SWC_1")
    val out = AggSchema.resample(df, AggSchema.Daily, "valid_time", Nil)
    assert(out.collect()(0).getAs[Double]("SWC_1_delta") == 5.0) // 8 − 3
  }

  test("resample: WD alone at daily (all-DROP) raises a clear error") {
    import spark.implicits._
    val df = Seq((ts("2020-01-01 00:00:00"), 123.0)).toDF("valid_time", "WD")
    val e = intercept[IllegalArgumentException] {
      AggSchema.resample(df, AggSchema.Daily, "valid_time", Nil)
    }
    assert(e.getMessage.contains("no aggregatable variables"))
  }

  test("slidingFeatures keeps null slots time-aligned") {
    import spark.implicits._
    val df = Seq(
      ("k", 1L, Some(1.0), Some(10.0)),
      ("k", 2L, None, Some(20.0)),
      ("k", 3L, Some(3.0), None))
      .toDF("key", "t", "a", "b")
    val out = Windows.slidingFeatures(df, Seq("key"), "t", Seq("a", "b"), 3)
      .collect()
    assert(out.length == 1)
    val aWin = out(0).getAs[scala.collection.Seq[Any]]("a_win")
    val bWin = out(0).getAs[scala.collection.Seq[Any]]("b_win")
    assert(aWin == Seq(1.0, null, 3.0)) // null preserved in position 2
    assert(bWin == Seq(10.0, 20.0, null))
  }

  test("coarsen: trim drops partial blocks; keyCols prevent cross-key mixing") {
    import spark.implicits._
    val rows = for {
      t <- Seq("a", "b"); x <- 0 until 4; y <- 0 until 2
    } yield (t, x, y, if (t == "a") 1.0 else 5.0)
    val df = rows.toDF("tkey", "x", "y", "v")
    val out = Windows.coarsen(df, "x", "y", Seq("v"), 2, trim = true,
      keyCols = Seq("tkey")).collect()
    // per key: x∈[0,4) y∈[0,2) → 2 full 2×2 blocks; two keys → 4 rows
    assert(out.length == 4)
    out.foreach { r =>
      val want = if (r.getAs[String]("tkey") == "a") 1.0 else 5.0
      assert(r.getAs[Double]("v_mean") == want) // no mixing across keys
    }
    // without trim, partial blocks appear when grid is odd-sized
    val odd = (0 until 3).flatMap(x => (0 until 3).map(y => ("a", x, y, 1.0)))
      .toDF("tkey", "x", "y", "v")
    val notrim = Windows.coarsen(odd, "x", "y", Seq("v"), 2, trim = false)
    val trimmed = Windows.coarsen(odd, "x", "y", Seq("v"), 2, trim = true)
    assert(notrim.count() == 4 && trimmed.count() == 1)
  }
}
