package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The one custom optimizer rule (SURVEY.md §4 "Hidden-partition
  * derivation" row, §7.1 M6).
  *
  * Scope: the rule fires ONLY on the legacy long-nanos layout, where
  * `Tables.events` materializes `ts = timestamp_micros(ts_ns div 1000)`
  * over a raw int64-nanos parquet column. There a predicate on the
  * *derived* timestamp is opaque to DataSourceStrategy, so nothing
  * reaches the parquet scan and every row-group is read — at 100 TB that
  * is the difference between scanning a day and scanning three years.
  * On a native-timestamp layout (the current corpus: timestamp[us],
  * normalized by an NTZ→TimestampType cast) the comparison is already
  * sargable, DataSourceStrategy pushes it natively, and this rule is a
  * structural no-op: its pattern matches only
  * `timestamp_micros(long div 1000)`, never a cast of a timestamp
  * column (PlanRuleSpec asserts both paths). The reference gets the
  * equivalent manifest-level pruning from Iceberg
  * (`TimeBasedPartitioningExamples.java:180-195`).
  *
  * The rule augments (never replaces) time comparisons: for
  * `timestamp_micros(x div 1000) >= lit(T)` it conjoins a sargable
  * raw-nanos bound that flows into parquet row-group/page stats.
  * Spark's `div` (IntegralDivide) truncates TOWARD ZERO, not toward
  * −∞, so the exact bounds depend on the literal's sign (q = x div
  * 1000):
  *   q >= T  ⟺  x >= (T > 0  ? T*1000 : T*1000 − 999)
  *   q <= T  ⟺  x <= (T >= 0 ? T*1000 + 999 : T*1000)
  *   q >  T  ⟺  q >= T+1;   q < T  ⟺  q <= T−1
  * A floor-semantics derivation (the first cut here) silently DROPPED
  * pre-epoch rows: x = −500 has q = 0, which passes `ts >= epoch`, but
  * fails the floor bound `x >= 0`. Derivation is also skipped when
  * |T| is large enough that ×1000 would overflow Long (e.g. the
  * year-9999 sentinel literal, 2.5e17 µs) — an overflowed bound is a
  * predicate that matches nothing, turning a conservative optimization
  * into an empty result set.
  * Registered via `spark.experimental.extraOptimizations` (no session
  * extension needed — Verify/Bench attach it at startup).
  */
object TimestampPushdownRule extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(rawNanos div 1000) and yields rawNanos. */
  private object MicrosOfNanos {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  /** A timestamp literal whose µs value survives the ×1000 derivation
    * without Long overflow. */
  private object UsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) if safeUs(v) => Some(v)
      case _ => None
    }
  }

  private def nsLit(v: Long): Literal = Literal(v, LongType)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** ×1000 (±1 for the strict forms, ±999 for the truncation shift)
    * must not overflow — an overflowed bound matches nothing and the
    * conjoined predicate would silently empty the result. */
  private def safeUs(t: Long): Boolean =
    // Long.MinValue first: math.abs(Long.MinValue) is NEGATIVE (its
    // negation doesn't exist), so the magnitude test alone would pass
    // the one value guaranteed to wrap
    t != Long.MinValue && math.abs(t) <= Long.MaxValue / 1000 - 2

  /** x >= bound ⟺ (x div 1000) >= t, under truncation-toward-zero. */
  private def lowerNs(t: Long): Long =
    if (t > 0) t * 1000 else t * 1000 - 999

  /** x <= bound ⟺ (x div 1000) <= t, under truncation-toward-zero. */
  private def upperNs(t: Long): Long =
    if (t >= 0) t * 1000 + 999 else t * 1000

  /** The sargable raw-nanos twin of one top-level conjunct, if any.
    * Strict forms reduce to the inclusive ones on t±1; flipped operand
    * order (lit OP micros) is each case's mirror. */
  private def derive(conjunct: Expression): Option[Expression] =
    conjunct match {
      case GreaterThanOrEqual(MicrosOfNanos(raw), UsLit(t)) =>
        Some(GreaterThanOrEqual(raw, nsLit(lowerNs(t))))
      case LessThanOrEqual(MicrosOfNanos(raw), UsLit(t)) =>
        Some(LessThanOrEqual(raw, nsLit(upperNs(t))))
      case GreaterThan(MicrosOfNanos(raw), UsLit(t)) =>
        Some(GreaterThanOrEqual(raw, nsLit(lowerNs(t + 1))))
      case LessThan(MicrosOfNanos(raw), UsLit(t)) =>
        Some(LessThanOrEqual(raw, nsLit(upperNs(t - 1))))
      // flipped operand order: lit OP micros(ns)
      case GreaterThanOrEqual(UsLit(t), MicrosOfNanos(raw)) =>
        Some(LessThanOrEqual(raw, nsLit(upperNs(t))))
      case LessThanOrEqual(UsLit(t), MicrosOfNanos(raw)) =>
        Some(GreaterThanOrEqual(raw, nsLit(lowerNs(t))))
      case GreaterThan(UsLit(t), MicrosOfNanos(raw)) =>
        Some(LessThanOrEqual(raw, nsLit(upperNs(t - 1))))
      case LessThan(UsLit(t), MicrosOfNanos(raw)) =>
        Some(GreaterThanOrEqual(raw, nsLit(lowerNs(t + 1))))
      case _ => None
    }

  /** Idempotent: the optimizer batch is a fixed point, so only conjuncts
    * whose derived twin is not already present are added. */
  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val existing = conjuncts.map(_.canonicalized).toSet
      val added = conjuncts.flatMap(derive)
        .filterNot(p => existing.contains(p.canonicalized))
        .distinct
      if (added.isEmpty) f
      else Filter((conjuncts ++ added).reduceLeft(And), child)
  }

  /** Attach to a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
}
