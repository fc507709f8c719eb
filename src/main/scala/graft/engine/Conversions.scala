package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OP-FN-1..15 — the AmeriFlux ("AMF") conversion library, re-expressed as
  * native Spark `Column` expressions. No UDFs anywhere: every function is a
  * composition of built-ins, so the whole library stays inside Catalyst
  * constant-folding and Tungsten whole-stage codegen.
  *
  * Semantics derive from the reference's scalar physics library
  * (`pipeline/carbonpipeline/Processing/processing_utils.py:12-111`,
  * constants at `Processing/constants.py:2-6`, physics provenance at
  * `pipeline/research/era5-logs.md:105-196`).
  *
  * Determinism note: `windSpeedMagnitude` uses `sqrt(u*u + v*v)` rather than
  * `hypot` so the exact same IEEE-754 operation sequence is expressible in
  * ANSI SQL oracles (hypot differs from sqrt-of-squares only near
  * overflow/underflow, irrelevant for geophysical magnitudes).
  */
object Conversions {

  val ZeroCInK = 273.15
  val DryAirMoleFractionN2 = 0.7808
  val DryAirMoleFractionO2 = 0.2095
  val DryAirMoleFractionAr = 0.0093

  // ---- unit conversions (OP-FN-1..3) ----
  def kelvinToCelsius(tK: Column): Column = tK - ZeroCInK
  def paToKpa(pPa: Column): Column = pPa / 1000d
  def kpaToPa(pKpa: Column): Column = pKpa * 1000d
  def kpaToHpa(pKpa: Column): Column = pKpa * 10d
  def volumetricSoilWater(swcDecimal: Column): Column = swcDecimal * 100d

  // ---- wind (OP-FN-4/5) ----
  def windSpeedMagnitude(u10: Column, v10: Column): Column =
    sqrt(u10 * u10 + v10 * v10)

  /** `(degrees(atan2(u, v)) + 360) % 360` — note the reference's argument
    * order `atan2(u10, v10)` (meteorological convention). Result ∈ [0, 360).
    */
  def windSpeedDirection(u10: Column, v10: Column): Column =
    pmod(degrees(atan2(u10, v10)) + 360d, lit(360d))

  // ---- humidity (OP-FN-6..8) ----
  /** Magnus approximation, coefficients a=17.625 b=243.04 (°C inputs are
    * derived internally from Kelvin). Returns percent.
    */
  def relativeHumidity(t2m: Column, d2m: Column): Column = {
    val tAirC = kelvinToCelsius(t2m)
    val tDewC = kelvinToCelsius(d2m)
    val a = 17.625
    val b = 243.04
    val gammaAir = (tAirC * a) / (tAirC + b)
    val gammaDew = (tDewC * a) / (tDewC + b)
    exp(gammaDew - gammaAir) * 100d
  }

  /** Tetens formula with temperature-conditional coefficients: (17.27,
    * 237.3) for T ≥ 0 °C else (21.875, 265.5). Input °C, output kPa.
    */
  def saturatedVaporPressure(tC: Column): Column = {
    val warm = exp(tC * 17.27 / (tC + 237.3))
    val cold = exp(tC * 21.875 / (tC + 265.5))
    when(tC >= 0d, warm).otherwise(cold) * 0.61078
  }

  /** es(T)·(1 − RH/100), kPa → hPa. Inputs in Kelvin. */
  def vaporPressureDeficit(t2m: Column, d2m: Column): Column = {
    val rh = relativeHumidity(t2m, d2m)
    val esKpa = saturatedVaporPressure(kelvinToCelsius(t2m))
    kpaToHpa(esKpa * (lit(1d) - rh / 100d))
  }

  // ---- radiation / energy balance (OP-FN-9..11, 13) ----
  def shortwaveOut(avgSdswrf: Column, fal: Column): Column = avgSdswrf * fal

  def longwaveOut(avgSdlwrf: Column, avgSnlwrf: Column): Column =
    avgSnlwrf - avgSdlwrf

  def netRadiation(avgSdswrf: Column, avgSdlwrf: Column, avgSnlwrf: Column,
      fal: Column): Column =
    avgSdswrf + avgSdlwrf - shortwaveOut(avgSdswrf, fal) -
      longwaveOut(avgSdlwrf, avgSnlwrf)

  def soilHeatFlux(avgIshf: Column, avgSlhtf: Column, avgSdswrf: Column,
      avgSdlwrf: Column, avgSnlwrf: Column, fal: Column): Column =
    netRadiation(avgSdswrf, avgSdlwrf, avgSnlwrf, fal) - avgIshf - avgSlhtf

  // ---- CO2 (OP-FN-12) ----
  /** Dry-air XCO₂ (ppm) → wet-air mole fraction, via RH → water-vapor mole
    * fraction and dry-air composition N₂ 0.7808 / O₂ 0.2095 / Ar 0.0093.
    */
  def dryToWetCo2Fraction(t2m: Column, d2m: Column, sp: Column,
      xco2Dry: Column): Column = {
    val rh = relativeHumidity(t2m, d2m)
    val esPa = kpaToPa(saturatedVaporPressure(kelvinToCelsius(t2m)))
    val xH2oWet = (rh / 100d) * esPa / sp
    val xDryWet = lit(1d) - xH2oWet
    val xH2oDry = xH2oWet / xDryWet
    val nTot = lit(DryAirMoleFractionN2 + DryAirMoleFractionO2 +
      DryAirMoleFractionAr) + xco2Dry / 1e6 + xH2oDry
    xco2Dry / nTot
  }

  // ---- light (OP-FN-14) ----
  /** `1.741·SW + 1.45`; the two-arg (PPFD_OUT) variant applies albedo to the
    * shortwave term before the affine map.
    */
  def ppfd(avgSdswrf: Column): Column = avgSdswrf * 1.741 + 1.45
  def ppfd(avgSdswrf: Column, fal: Column): Column =
    avgSdswrf * 1.741 * fal + 1.45

  // ---- OP-FN-15 identity passthrough ----
  def identity(c: Column): Column = c

  /** The PROCESSORS dispatch table (`processing_utils.py:114-139`): predictor
    * name → function over its source columns (ordered per
    * [[Predictors.variablesForPredictor]]). Missing key = pass-through of
    * column 0 (`processor.py:44-45`).
    */
  val processors: Map[String, Seq[Column] => Column] = {
    val k2c: Seq[Column] => Column = cs => kelvinToCelsius(cs.head)
    val swc: Seq[Column] => Column = cs => volumetricSoilWater(cs.head)
    Map(
      "RH" -> (cs => relativeHumidity(cs(0), cs(1))),
      "VPD" -> (cs => vaporPressureDeficit(cs(0), cs(1))),
      "TA" -> k2c,
      "PA" -> (cs => paToKpa(cs.head)),
      "SW_OUT" -> (cs => shortwaveOut(cs(0), cs(1))),
      "LW_OUT" -> (cs => longwaveOut(cs(0), cs(1))),
      "NETRAD" -> (cs => netRadiation(cs(0), cs(1), cs(2), cs(3))),
      "WS" -> (cs => windSpeedMagnitude(cs(0), cs(1))),
      "WD" -> (cs => windSpeedDirection(cs(0), cs(1))),
      "G" -> (cs => soilHeatFlux(cs(0), cs(1), cs(2), cs(3), cs(4), cs(5))),
      "TS_1" -> k2c, "TS_2" -> k2c, "TS_3" -> k2c, "TS_4" -> k2c, "TS_5" -> k2c,
      "SWC_1" -> swc, "SWC_2" -> swc, "SWC_3" -> swc, "SWC_4" -> swc,
      "SWC_5" -> swc,
      "PPFD_IN" -> (cs => ppfd(cs.head)),
      "PPFD_OUT" -> (cs => ppfd(cs(0), cs(1))),
      "CO2" -> (cs => dryToWetCo2Fraction(cs(0), cs(1), cs(2), cs(3))),
      "WTD" -> (cs => cs.head)
    )
  }

  /** Apply a predictor's conversion to a frame whose columns are the ERA5
    * long names (`convert_ameriflux_to_era5`, `Processing/processor.py:18-46`):
    * fetch the predictor's source columns, apply the processor (or
    * pass-through column 0).
    */
  def convert(predictor: String, sourceCols: Seq[Column]): Column =
    processors.get(predictor) match {
      case Some(f) => f(sourceCols)
      case None    => sourceCols.head
    }
}
