package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OP-AGG-2 — the declarative resample-aggregation schema
  * (`pipeline/carbonpipeline/Processing/processing_utils.py:142-256`,
  * executed at `core.py:230-247`). Each variable declares named outputs per
  * granularity; `Drop` removes the variable at that granularity; `Delta` is
  * the reference's custom `s.iloc[-1] - s.iloc[0]` lambda, implemented
  * order-safely as `max_by(v, t) - min_by(v, t)` (no sort-dependent
  * aggregation, so it parallelizes with a plain hash aggregate).
  */
object AggSchema {

  sealed trait AggFn
  case object Mean extends AggFn
  case object Std extends AggFn // pandas default ddof=1 ⇒ stddev_samp
  case object Min extends AggFn
  case object Max extends AggFn
  case object Sum extends AggFn
  case object Delta extends AggFn // last-by-time − first-by-time

  sealed trait Granularity { def truncUnit: String }
  case object Daily extends Granularity { val truncUnit = "day" }
  case object Monthly extends Granularity { val truncUnit = "month" }

  /** Per-variable spec: None = DROP at that granularity. */
  type VarSpec = Option[Seq[(String, AggFn)]]

  private def spec(entries: (String, AggFn)*): VarSpec = Some(entries)

  /** Mirror of AGG_SCHEMA (`processing_utils.py:142-256`). */
  val schema: Map[String, Map[Granularity, VarSpec]] = {
    val swc = (1 to 5).map { k =>
      val v = s"SWC_$k"
      val s = spec(s"${v}_mean" -> Mean, s"${v}_min" -> Min,
        s"${v}_delta" -> Delta)
      v -> Map[Granularity, VarSpec](Daily -> s, Monthly -> s)
    }
    val ts = (1 to 5).map { k =>
      val v = s"TS_$k"
      val s = spec(s"${v}_mean" -> Mean, s"${v}_min" -> Min,
        s"${v}_max" -> Max)
      v -> Map[Granularity, VarSpec](Daily -> s, Monthly -> s)
    }
    Map[String, Map[Granularity, VarSpec]](
      "TA" -> Map(
        Daily -> spec("TA_mean" -> Mean, "TA_std" -> Std, "TA_min" -> Min,
          "TA_max" -> Max),
        Monthly -> spec("TA_mean" -> Mean, "TA_std" -> Std, "TA_min" -> Min,
          "TA_max" -> Max)),
      "PA" -> Map(
        Daily -> spec("PA_mean" -> Mean),
        Monthly -> spec("PA_mean" -> Mean)),
      "P" -> Map(
        Daily -> spec("P_sum" -> Sum, "P_max" -> Max),
        Monthly -> spec("P_sum" -> Sum, "P_max_daily" -> Max)),
      "RH" -> Map(
        Daily -> spec("RH_mean" -> Mean, "RH_std" -> Std, "RH_max" -> Max,
          "RH_min" -> Min),
        Monthly -> spec("RH_mean" -> Mean, "RH_std" -> Std)),
      "VPD" -> Map(
        // note: the reference's daily VPD block names its mean "RH_mean"
        // (`processing_utils.py:166`) — replicated literally, don't "fix".
        Daily -> spec("RH_mean" -> Mean, "VPD_std" -> Std, "VPD_max" -> Max),
        Monthly -> spec("VPD_mean" -> Mean, "VPD_std" -> Std)),
      "WS" -> Map(
        Daily -> spec("WS_mean" -> Mean, "WS_std" -> Std, "WS_max" -> Max),
        Monthly -> spec("WS_mean" -> Mean, "WS_std" -> Std)),
      "WD" -> Map(Daily -> None, Monthly -> None),
      "SW_IN" -> Map(
        Daily -> spec("SW_IN_mean" -> Mean, "SW_IN_std" -> Std,
          "SW_IN_total" -> Sum, "SW_IN_max" -> Max),
        Monthly -> spec("SW_IN_mean" -> Mean, "SW_IN_std" -> Std,
          "SW_IN_total" -> Sum)),
      "SW_IN_POT" -> Map(
        Daily -> spec("SW_IN_POT_total" -> Sum),
        Monthly -> spec("SW_IN_POT_total" -> Sum)),
      "SW_OUT" -> Map(
        Daily -> spec("SW_OUT_mean" -> Mean),
        Monthly -> spec("SW_OUT_mean" -> Mean)),
      "LW_IN" -> Map(
        Daily -> spec("LW_IN_mean" -> Mean),
        Monthly -> spec("LW_IN_mean" -> Mean)),
      "LW_OUT" -> Map(
        Daily -> spec("LW_OUT_mean" -> Mean),
        Monthly -> spec("LW_OUT_mean" -> Mean)),
      "NETRAD" -> Map(
        Daily -> spec("NETRAD_mean" -> Mean, "NETRAD_std" -> Std,
          "NETRAD_total" -> Sum),
        Monthly -> spec("NETRAD_mean" -> Mean, "NETRAD_std" -> Std,
          "NETRAD_total" -> Sum)),
      "LE" -> Map(
        Daily -> spec("LE_mean" -> Mean, "LE_total" -> Sum),
        Monthly -> spec("LE_mean" -> Mean, "LE_total" -> Sum)),
      "H" -> Map(
        Daily -> spec("H_mean" -> Mean, "H_total" -> Sum),
        Monthly -> spec("H_mean" -> Mean, "H_total" -> Sum)),
      "G" -> Map(
        Daily -> spec("G_mean" -> Mean, "G_total" -> Sum),
        Monthly -> spec("G_mean" -> Mean, "G_total" -> Sum)),
      "USTAR" -> Map(
        Daily -> spec("USTAR_mean" -> Mean, "USTAR_max" -> Max),
        Monthly -> spec("USTAR_mean" -> Mean)),
      "PPFD_IN" -> Map(
        Daily -> spec("PPFD_IN_integral" -> Sum, "PPFD_IN_max" -> Max),
        Monthly -> None),
      "PPFD_OUT" -> Map(
        Daily -> spec("PPFD_OUT_integral" -> Sum),
        Monthly -> None),
      "CO2" -> Map(
        Daily -> spec("CO2_mean" -> Mean),
        Monthly -> spec("CO2_mean" -> Mean)),
      "WTD" -> Map(
        Daily -> spec("WTD_mean" -> Mean),
        Monthly -> spec("WTD_mean" -> Mean))
    ) ++ swc ++ ts
  }

  def aggColumn(fn: AggFn, variable: String, timeCol: Column): Column =
    fn match {
      case Mean  => avg(col(variable))
      case Std   => stddev_samp(col(variable))
      case Min   => min(col(variable))
      case Max   => max(col(variable))
      case Sum   => sum(col(variable))
      case Delta => max_by(col(variable), timeCol) -
        min_by(col(variable), timeCol)
    }

  /** Generate the aggregate expression list for the variables actually
    * present (the reference filters the schema to available columns,
    * `core.py:231-232`).
    */
  def aggExprs(available: Seq[String], gran: Granularity,
      timeCol: Column): Seq[Column] = {
    val named: Seq[(String, Column)] = for {
      v <- available
      perGran <- schema.get(v).toSeq
      entries <- perGran.getOrElse(gran, None).toSeq
      (outName, fn) <- entries
    } yield outName -> aggColumn(fn, v, timeCol)
    // Last-wins name dedupe: the reference builds its agg spec as a dict
    // comprehension (`core.py:235-243`), so a duplicate output name (the
    // VPD-daily "RH_mean" quirk, `processing_utils.py:166`) silently keeps
    // the LAST entry. Spark's agg would instead emit two identically-named
    // columns and crash any downstream write — replicate dict semantics:
    // first-occurrence position, last-occurrence value.
    val lastByName = named.toMap // toMap keeps the last value per key
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    named.foreach { case (n, _) => seen += n }
    seen.toSeq.map(n => lastByName(n).as(n))
  }

  /** Resample a long-form frame to daily/monthly per the declarative schema
    * (`core.py:230-247`): group by truncated time label + spatial keys.
    * Monthly labels use `date_trunc('month')` (the reference's
    * `to_period('M')`, `core.py:245-246`).
    */
  def resample(df: DataFrame, gran: Granularity, timeCol: String,
      keyCols: Seq[String]): DataFrame = {
    val vars = df.columns.filter(schema.contains).toSeq
    val label = date_trunc(gran.truncUnit, col(timeCol)).as("period")
    val exprs = aggExprs(vars, gran, col(timeCol))
    require(exprs.nonEmpty,
      s"no aggregatable variables for $gran among ${df.columns.mkString(",")}")
    df.groupBy((label +: keyCols.map(col)): _*).agg(exprs.head, exprs.tail: _*)
  }
}
