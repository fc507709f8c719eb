package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Conversions

/** Goldens for OP-FN-1..15 (values independently computed from the formulas
  * at `processing_utils.py:12-111`) + ScalaCheck properties from SURVEY §5,
  * evaluated in batch (one Spark job per property over generated rows).
  */
class ConversionsSpec extends SparkSpec {

  /** Deterministic ScalaCheck samples (fixed seed — reproducible CI). */
  def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(42L))

  test("kelvin_to_celsius golden") {
    assertClose(eval1(Conversions.kelvinToCelsius(lit(300.0))), 26.85)
  }

  test("pressure conversions golden") {
    assertClose(eval1(Conversions.paToKpa(lit(101325.0))), 101.325)
    assertClose(eval1(Conversions.kpaToPa(lit(101.325))), 101325.0)
    assertClose(eval1(Conversions.kpaToHpa(lit(3.5))), 35.0)
    assertClose(eval1(Conversions.volumetricSoilWater(lit(0.32))), 32.0)
  }

  test("wind magnitude/direction goldens") {
    assertClose(eval1(Conversions.windSpeedMagnitude(lit(3.0), lit(4.0))), 5.0)
    assertClose(eval1(Conversions.windSpeedDirection(lit(1.0), lit(1.0))), 45.0)
    assertClose(eval1(Conversions.windSpeedDirection(lit(-1.0), lit(-1.0))), 225.0)
  }

  test("relative humidity golden (Magnus)") {
    assertClose(eval1(Conversions.relativeHumidity(lit(293.15), lit(283.15))),
      52.54132558106588, 1e-9)
  }

  test("Tetens saturated vapor pressure — both branches + 0 °C boundary") {
    assertClose(eval1(Conversions.saturatedVaporPressure(lit(25.0))),
      3.167673991975822, 1e-12)
    assertClose(eval1(Conversions.saturatedVaporPressure(lit(-10.0))),
      0.25945218963508093, 1e-12)
    // T = 0 takes the WARM branch (>= 0, processing_utils.py:64-65); both
    // arms coincide at exp(0)·0.61078 anyway — pin the exact value.
    assertClose(eval1(Conversions.saturatedVaporPressure(lit(0.0))), 0.61078, 0)
  }

  test("vapor pressure deficit golden") {
    assertClose(eval1(Conversions.vaporPressureDeficit(lit(293.15), lit(283.15))),
      11.09680958849204, 1e-9)
  }

  test("radiation / energy-balance chain goldens") {
    assertClose(eval1(Conversions.shortwaveOut(lit(100.0), lit(0.2))), 20.0)
    assertClose(eval1(Conversions.longwaveOut(lit(350.0), lit(-50.0))), -400.0)
    // netrad = sw_in + lw_in - sw_out - lw_out
    assertClose(eval1(Conversions.netRadiation(lit(100.0), lit(350.0),
      lit(-50.0), lit(0.2))), 100.0 + 350.0 - 20.0 - (-400.0))
    assertClose(eval1(Conversions.soilHeatFlux(lit(30.0), lit(60.0),
      lit(100.0), lit(350.0), lit(-50.0), lit(0.2))), 830.0 - 90.0)
  }

  test("dry→wet CO2 fraction golden") {
    assertClose(eval1(Conversions.dryToWetCo2Fraction(lit(293.15), lit(283.15),
      lit(101325.0), lit(420.0))), 414.8994762055327, 1e-9)
  }

  test("PPFD 1- and 2-arg goldens") {
    assertClose(eval1(Conversions.ppfd(lit(100.0))), 175.55, 1e-12)
    assertClose(eval1(Conversions.ppfd(lit(100.0), lit(0.2))), 36.27, 1e-12)
  }

  test("PROCESSORS registry: all 25 predictors dispatch; unknown = identity") {
    val names = Seq("RH", "VPD", "TA", "PA", "SW_OUT", "LW_OUT", "NETRAD",
      "WS", "WD", "G", "TS_1", "TS_2", "TS_3", "TS_4", "TS_5", "SWC_1",
      "SWC_2", "SWC_3", "SWC_4", "SWC_5", "PPFD_IN", "PPFD_OUT", "CO2", "WTD")
    names.foreach(n => assert(Conversions.processors.contains(n), n))
    // pass-through predictors (P, SW_IN, ...) fall back to column 0
    assertClose(eval1(Conversions.convert("P", Seq(lit(7.5)))), 7.5)
    assertClose(eval1(Conversions.convert("TA", Seq(lit(300.0)))), 26.85)
  }

  // ---- properties (SURVEY §5.3), batch-evaluated ----

  private val finite = Gen.choose(-80.0, 80.0)

  test("property: WD in [0, 360) and WS >= max(|u|,|v|)") {
    import spark.implicits._
    val uv = samples(Gen.zip(finite, finite))
      .filter { case (u, v) => u != 0 || v != 0 }
    val rows = uv.toDF("u", "v").select(
      Conversions.windSpeedDirection(col("u"), col("v")).as("wd"),
      Conversions.windSpeedMagnitude(col("u"), col("v")).as("ws"),
      greatest(abs(col("u")), abs(col("v"))).as("m")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0 && r.getDouble(0) < 360, r)
      assert(r.getDouble(1) >= r.getDouble(2) - 1e-12, r)
    }
  }

  test("property: RH > 0; VPD >= 0 when dewpoint <= air temp") {
    import spark.implicits._
    val cases = samples(Gen.zip(Gen.choose(233.15, 323.15), Gen.choose(0.0, 40.0)))
      .map { case (t2m, dep) => (t2m, t2m - dep) }
    val rows = cases.toDF("t2m", "d2m").select(
      Conversions.relativeHumidity(col("t2m"), col("d2m")).as("rh"),
      Conversions.vaporPressureDeficit(col("t2m"), col("d2m")).as("vpd"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) > 0, r)
      assert(r.getDouble(1) >= -1e-9, r)
    }
  }
}
