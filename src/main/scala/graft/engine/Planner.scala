package graft.engine

import java.time.LocalDateTime
import java.time.YearMonth

/** OP-MISC-1 — the request-group planner (`Processing/processor.py:116-186`):
  * split an arbitrary `[start, end]` hourly range into the minimal set of
  * scan requests. This is scan-partition planning (SURVEY §4) — a pure
  * driver-side function: full months collapse to whole-month groups,
  * remainders become per-day groups with exact hour slices; monthly mode
  * emits full-year or per-month groups.
  */
object Planner {

  /** One planned request. Hourly mode: months has exactly one entry.
    * Field formats mirror the reference's strings: year "2020", month "03",
    * day "07", hour "13:00".
    */
  final case class RequestGroup(year: String, months: Seq[String],
      days: Seq[String], hours: Seq[String])

  private def fullHours: Seq[String] = (0 until 24).map(h => f"$h%02d:00")
  private def monthDays(y: Int, m: Int): Seq[Int] =
    1 to YearMonth.of(y, m).lengthOfMonth()

  private def monthsBetween(start: LocalDateTime,
      end: LocalDateTime): Seq[YearMonth] = {
    val first = YearMonth.from(start)
    val last = YearMonth.from(end)
    Iterator.iterate(first)(_.plusMonths(1)).takeWhile(!_.isAfter(last)).toSeq
  }

  def requestGroups(start: LocalDateTime, end: LocalDateTime,
      monthly: Boolean): Seq[RequestGroup] =
    if (monthly) monthlyGroups(start, end) else hourlyGroups(start, end)

  /** Monthly-means mode (`processor.py:136-156`): full calendar years
    * collapse to one group per year (with the CDS-tolerated 1..31 day list);
    * otherwise one group per fully-contained month.
    */
  private def monthlyGroups(start: LocalDateTime,
      end: LocalDateTime): Seq[RequestGroup] = {
    val fullYears = (start.getMonthValue, start.getDayOfMonth, start.getHour) == (1, 1, 0) &&
      (end.getMonthValue, end.getDayOfMonth, end.getHour) == (12, 31, 23)
    if (fullYears) {
      (start.getYear to end.getYear).map { y =>
        RequestGroup(y.toString, (1 to 12).map(m => f"$m%02d"),
          (1 to 31).map(d => f"$d%02d"), fullHours)
      }
    } else {
      monthsBetween(start, end).collect {
        case ym if !start.isAfter(ym.atDay(1).atStartOfDay()) &&
            !ym.atDay(1).atStartOfDay().isAfter(end) =>
          RequestGroup(ym.getYear.toString, Seq(f"${ym.getMonthValue}%02d"),
            monthDays(ym.getYear, ym.getMonthValue).map(d => f"$d%02d"),
            fullHours)
      }
    }
  }

  /** Hourly mode (`processor.py:159-186`): per month overlapping the range,
    * a whole-month group when fully covered, else per-day groups with exact
    * hour slices (first/last day truncated to the range's hours).
    */
  private def hourlyGroups(start: LocalDateTime,
      end: LocalDateTime): Seq[RequestGroup] =
    monthsBetween(start, end).flatMap { ym =>
      val monthStart = ym.atDay(1).atStartOfDay()
      val monthEnd = ym.atEndOfMonth().atTime(23, 59, 59)
      val mStart = if (start.isAfter(monthStart)) start else monthStart
      val mEnd = if (end.isBefore(monthEnd)) end else monthEnd
      if (mStart.isAfter(mEnd)) Nil
      else {
        val coversMonth =
          mStart.withMinute(0).withSecond(0).withNano(0) == monthStart &&
            !mEnd.withMinute(0).withSecond(0).withNano(0)
              .isBefore(monthEnd.withMinute(0).withSecond(0).withNano(0))
        if (coversMonth)
          Seq(RequestGroup(ym.getYear.toString,
            Seq(f"${ym.getMonthValue}%02d"),
            monthDays(ym.getYear, ym.getMonthValue).map(d => f"$d%02d"),
            fullHours))
        else {
          val firstDay = mStart.toLocalDate
          val lastDay = mEnd.toLocalDate
          Iterator.iterate(firstDay)(_.plusDays(1))
            .takeWhile(!_.isAfter(lastDay)).flatMap { d =>
              val h0 = if (d == firstDay) mStart.getHour else 0
              val h1 = if (d == lastDay) mEnd.getHour else 23
              if (h0 > h1) None
              else Some(RequestGroup(d.getYear.toString,
                Seq(f"${d.getMonthValue}%02d"), Seq(f"${d.getDayOfMonth}%02d"),
                (h0 to h1).map(h => f"$h%02d:00")))
            }.toSeq
        }
      }
    }

  /** Total hour count covered by a plan — the coverage invariant used by the
    * property tests: hourly-mode groups must cover exactly the hours of
    * `[start, end]` with no overlap.
    */
  def coveredHours(groups: Seq[RequestGroup]): Long =
    groups.map(g => g.months.size.toLong * g.days.size * g.hours.size).sum
}
