package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two flagship composed flows (SURVEY §3.2/§3.3) as single
  * declarative DataFrame chains — Catalyst sees the whole plan, so filter
  * pushdown / column pruning / join placement span the entire pipeline
  * rather than stopping at operator boundaries as in the reference's eager
  * step-by-step execution.
  */
object Pipeline {

  /** OP-MISC-3 — two-source wide restructure (`dataset.py:246-268`): station
    * predictor columns become `<var>_AMF`, ERA5-converted ones `<var>_ERA5`,
    * ordered by variable name (the reference's column-level sort,
    * `dataset.py:268`).
    */
  def twoSourceWide(df: DataFrame, timeCol: String, amfVars: Seq[String],
      era5Exprs: Map[String, Column]): DataFrame = {
    val vars = (amfVars ++ era5Exprs.keys).distinct.sorted
    val cols = vars.flatMap { v =>
      val amf = if (amfVars.contains(v)) Some(col(v).as(s"${v}_AMF")) else None
      val era5 = era5Exprs.get(v).map(_.as(s"${v}_ERA5"))
      amf.toSeq ++ era5.toSeq
    }
    df.select(col(timeCol) +: cols: _*)
  }

  /** §3.3 — the point/gap-fill flow (`core.py:259-301`), re-targeted at
    * arbitrary tables: parse timestamps (OP-DT-1), keep top-of-hour rows
    * (OP-FLT-2), restrict to the requested range (OP-FLT-1), find rows with
    * missing values (OP-FLT-3), left-join the converted ERA5 frame on
    * timestamp (OP-JOIN-3), and emit the two-source wide shape (OP-MISC-3).
    *
    * `station` needs a string/timestamp `timestamp` column + predictor
    * columns; `era5` is keyed by the same hourly timestamps. At scale both
    * sides are hourly-keyed facts → sort-merge join on time, no broadcast.
    */
  def gapFill(station: DataFrame, era5: DataFrame, timeCol: String,
      predictors: Seq[String], era5Exprs: Map[String, Column],
      range: Option[(String, String)] = None): DataFrame = {
    val parsed = station.withColumn(timeCol,
      Dates.parseTimestamp(col(timeCol).cast("string")))
      .filter(col(timeCol).isNotNull)
    // OP-FLT-1 (`processor.py:54-62`): restrict to the requested range and
    // FAIL when the request exceeds the station's coverage — the reference
    // raises rather than silently gap-filling hours it has no data for.
    // The bounds check is one 1-row aggregate, eager like the reference's.
    val ranged = range match {
      case Some((start, end)) =>
        val b = Relational.timeBounds(parsed, timeCol).collect()(0)
        val (tMin, tMax) = (b.getTimestamp(0), b.getTimestamp(1))
        val s = java.sql.Timestamp.valueOf(start)
        val e = java.sql.Timestamp.valueOf(end)
        require(!s.before(tMin) && !e.after(tMax),
          s"requested range [$start, $end] exceeds station coverage [$tMin, $tMax]")
        Relational.timeRange(parsed, timeCol, start, end)
      case None => parsed
    }
    val hourly = Relational.topOfHour(ranged, timeCol)
    val missing = Relational.anyNull(hourly, predictors)
    val joined = Joins.gapfillAlign(missing, era5, timeCol)
    twoSourceWide(joined, timeCol, predictors, era5Exprs)
  }

  /** §3.2 — the area flow (`core.py:170-257`): scan+union → rename → enrich
    * with monthly side tables → bbox clip → AMF conversion → declarative
    * resample. Each stage is optional, mirroring the reference's
    * config-driven composition. The returned frame is unsunk — callers pick
    * OP-SNK-1/3 via [[Sinks]].
    */
  def areaProcess(grid: DataFrame, renames: Map[String, String],
      sides: Seq[(DataFrame, Seq[String])], regions: Option[DataFrame],
      latCol: String, lonCol: String, timeCol: String,
      predictorExprs: Map[String, Column],
      agg: Option[AggSchema.Granularity]): DataFrame = {
    val renamed = Relational.applyRename(grid, renames)
    val enriched = sides.foldLeft(renamed) { case (d, (side, keys)) =>
      Joins.enrich(d, side, keys)
    }
    val clipped = regions match {
      case Some(r) => Joins.bboxClip(enriched, r, latCol, lonCol)
      case None    => enriched
    }
    val keyCols = (if (regions.isDefined) Seq("region_id") else Nil) ++
      Seq(latCol, lonCol)
    val converted = clipped.select(
      (keyCols :+ timeCol).map(col) ++
        predictorExprs.toSeq.sortBy(_._1).map { case (p, e) => e.as(p) }: _*)
    agg match {
      case Some(g) => AggSchema.resample(converted, g, timeCol, keyCols)
      case None    => converted
    }
  }

  /** Star-schema revenue rollup: fact → fact join on the order key, then
    * the dimension chain, grouped to (region, month). The join placement
    * IS the scale design: lineitem⋈orders shuffles on the order key (both
    * are facts — with both bucketed on it, even that exchange goes away);
    * customer joins on the cust key WITHOUT a broadcast hint because at
    * full scale the customer dimension is fact-sized (AQE may still
    * broadcast it at small SF — that's its call, made from measured
    * sizes); nation and region are genuinely bounded dims and are
    * broadcast explicitly. Revenue is computed in exact integer cents —
    * `round(price·100)·(100 − round(disc·100))` — so the rollup sum is
    * order-independent (a float product sum would hash-diverge across
    * partitionings, let alone engines), divided back out once per group.
    */
  def revenueByRegionMonth(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      region: DataFrame): DataFrame = {
    val revCents = round(col("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(col("l_discount") * 100).cast("long"))
    lineitem.select(col("l_orderkey"), revCents.as("__rev"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
        date_trunc("month", col("o_orderdate")).as("year_month")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("year_month"))
      // half-up to whole cents in INTEGER space — round(double, 2) is a
      // trap for money: a .5 cents boundary (common with two-decimal
      // inputs) rounds differently across engines depending on whether
      // they round the shortest decimal repr or the scaled binary value
      // (found by the sf0.1 sweep: 70334114.865 → .87 vs .86)
      .agg((floor((sum(col("__rev")).cast("double") + 50.0) / 100.0)
        .cast("double") / 100.0).as("revenue"),
        count(lit(1)).as("n_items"))
  }
}
