package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OP-DT-1..4 / OP-STR-2 — date-time parsing, parts, sequences and
  * filename→date extraction, as pure Column expressions.
  */
object Dates {

  /** OP-DT-1 — two-format timestamp parse with fallback
    * (`processor.py:65-87`): try `yyyy-MM-dd HH:mm:ss`, else the compact
    * `yyyyMMddHHmm` (reshaped via regexp), unparseable → null (the
    * reference's NaT). `try_to_timestamp` returns null on mismatch
    * (matching `errors="coerce"`) even under ANSI mode, where plain
    * `to_timestamp` raises.
    */
  def parseTimestamp(ts: Column): Column =
    coalesce(
      try_to_timestamp(ts, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(regexp_replace(ts,
        "^(\\d{4})(\\d{2})(\\d{2})(\\d{2})(\\d{2})$",
        "$1-$2-$3 $4:$5:00"), lit("yyyy-MM-dd HH:mm:ss")))

  /** OP-DT-2 — date parts (`processor.py:105-108`, `inference/core.py:53-58`). */
  def dateParts(ts: Column): Seq[(String, Column)] = Seq(
    "year" -> year(ts),
    "month" -> month(ts),
    "day" -> dayofmonth(ts),
    "doy" -> dayofyear(ts),
    "hod" -> hour(ts),
    "hms" -> date_format(ts, "HH:mm:ss"))

  /** OP-DT-3 — calendar sequence generation (`processor.py:147,159,175`):
    * an exploded hourly/daily/monthly series between two bounds.
    */
  def timeSeries(start: Column, end: Column, step: String): Column =
    explode(sequence(start, end, expr(s"interval 1 $step")))

  /** OP-DT-4 — month-end / month-truncate (`downloader.py:85-87`,
    * `core.py:246`).
    */
  def monthEnd(ts: Column): Column = last_day(ts)
  def monthStart(ts: Column): Column = date_trunc("month", ts)

  /** OP-STR-2 — filename parse → date: `wtd-*-YYYYMMDD.tif`
    * (`downloader.py:64-71`, `dataset.py:163-165`).
    */
  def filenameDate(name: Column): Column =
    to_date(regexp_extract(name, "-(\\d{8})\\.tif$", 1), "yyyyMMdd")
}
