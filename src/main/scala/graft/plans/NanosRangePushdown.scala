package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: recover parquet predicate pushdown for time filters
  * over the nanosecond-epoch loader conversion.
  *
  * Spark 4 reads parquet TIMESTAMP(NANOS) only as a raw long
  * (`nanosAsLong`), so the loader derives the usable timestamp as
  * `timestamp_micros(ts DIV 1000)` — and every range predicate an
  * operator then places on that DERIVED column stops at a post-scan
  * Filter: the scan pushes `IsNotNull(ts)` and nothing else, which at
  * 100 TB means a time-range query reads every row group of the events
  * table. The comparison is monotone in the raw long, so this rule adds
  * the equivalent RAW-COLUMN bound as an extra conjunct (the original
  * predicate stays — the added one is what the scan can translate into
  * row-group stats pruning):
  *
  *   timestamp_micros(x DIV 1000) >= T  →  x >= T·1000
  *   timestamp_micros(x DIV 1000) >  T  →  x >= (T+1)·1000
  *   timestamp_micros(x DIV 1000) <= T  →  x <= T·1000 + 999
  *   timestamp_micros(x DIV 1000) <  T  →  x <= T·1000 − 1
  *   timestamp_micros(x DIV 1000) =  T  →  both bounds
  *
  * DATA CONTRACT: raw values are non-negative (post-1970 epochs). The
  * loader's own `DIV` conversion already truncates toward zero, which
  * misplaces pre-1970 nanos by one microsecond — negative epochs are
  * out of contract BEFORE this rule, and the rule additionally requires
  * the literal bound itself to be ≥ 0. Idempotent (bounds already
  * present are not re-added), so it is safe in a fixed-point batch
  * (`spark.experimental.extraOptimizations` runs until stable).
  */
object NanosRangePushdown extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxSafeMicros = (Long.MaxValue - 999L) / 1000L

  /** The raw long column under the loader conversion, if `e` is one. */
  private def rawOf(e: Expression): Option[Expression] = e match {
    case MicrosToTimestamp(d: IntegralDivide) => d.right match {
      case Literal(1000L, LongType) => Some(d.left)
      case _ => None
    }
    case _ => None
  }

  private def microsOf(e: Expression): Option[Long] = e match {
    case Literal(t: Long, TimestampType) if t >= 0 && t <= MaxSafeMicros =>
      Some(t)
    case _ => None
  }

  // NOTE each conversion-on-the-left arm is GUARDED on rawOf — an
  // unguarded first arm would swallow every comparison of its class and
  // make the literal-on-the-left mirrors below unreachable
  private def bounds(cmp: Expression): Seq[Expression] = cmp match {
    case GreaterThanOrEqual(c, l) if rawOf(c).isDefined =>
      (rawOf(c), microsOf(l)) match {
        case (Some(x), Some(t)) =>
          Seq(GreaterThanOrEqual(x, Literal(t * 1000L)))
        case _ => Nil
      }
    case GreaterThan(c, l) if rawOf(c).isDefined =>
      (rawOf(c), microsOf(l)) match {
        case (Some(x), Some(t)) =>
          Seq(GreaterThanOrEqual(x, Literal((t + 1) * 1000L)))
        case _ => Nil
      }
    case LessThanOrEqual(c, l) if rawOf(c).isDefined =>
      (rawOf(c), microsOf(l)) match {
        case (Some(x), Some(t)) =>
          Seq(LessThanOrEqual(x, Literal(t * 1000L + 999L)))
        case _ => Nil
      }
    case LessThan(c, l) if rawOf(c).isDefined =>
      (rawOf(c), microsOf(l)) match {
        case (Some(x), Some(t)) =>
          Seq(LessThanOrEqual(x, Literal(t * 1000L - 1L)))
        case _ => Nil
      }
    case EqualTo(c, l) if rawOf(c).isDefined =>
      (rawOf(c), microsOf(l)) match {
        case (Some(x), Some(t)) =>
          Seq(GreaterThanOrEqual(x, Literal(t * 1000L)),
            LessThanOrEqual(x, Literal(t * 1000L + 999L)))
        case _ => Nil
      }
    // literal-on-the-left mirrors
    case GreaterThanOrEqual(l, c) if rawOf(c).isDefined =>
      bounds(LessThanOrEqual(c, l))
    case GreaterThan(l, c) if rawOf(c).isDefined => bounds(LessThan(c, l))
    case LessThanOrEqual(l, c) if rawOf(c).isDefined =>
      bounds(GreaterThanOrEqual(c, l))
    case LessThan(l, c) if rawOf(c).isDefined => bounds(GreaterThan(c, l))
    case EqualTo(l, c) if rawOf(c).isDefined => bounds(EqualTo(c, l))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val extra = conjuncts.flatMap(bounds)
        .filterNot(b => conjuncts.exists(_.semanticEquals(b)))
        .distinct
      if (extra.isEmpty) f
      else Filter((conjuncts ++ extra).reduce(And), child)
  }
}
