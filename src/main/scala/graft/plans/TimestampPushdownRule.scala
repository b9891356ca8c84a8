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
  * `timestamp_micros(x div 1000) >= lit(T)` it conjoins `x >= T*1000`,
  * which is sargable and flows into parquet row-group/page stats. Floor
  * semantics of `div` make the bounds exact:
  *   micros(x) >= T  ⟺  x >= T*1000
  *   micros(x) <= T  ⟺  x <= T*1000 + 999
  *   micros(x) >  T  ⟺  x >= (T+1)*1000
  *   micros(x) <  T  ⟺  x <  T*1000
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

  private def usLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, TimestampType) => Some(v)
    case _ => None
  }

  private def nsLit(v: Long): Literal = Literal(v, LongType)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The sargable raw-nanos twin of one top-level conjunct, if any. */
  private def derive(conjunct: Expression): Option[Expression] =
    conjunct match {
      case GreaterThanOrEqual(MicrosOfNanos(raw), l) if usLit(l).isDefined =>
        Some(GreaterThanOrEqual(raw, nsLit(usLit(l).get * 1000)))
      case LessThanOrEqual(MicrosOfNanos(raw), l) if usLit(l).isDefined =>
        Some(LessThanOrEqual(raw, nsLit(usLit(l).get * 1000 + 999)))
      case GreaterThan(MicrosOfNanos(raw), l) if usLit(l).isDefined =>
        Some(GreaterThanOrEqual(raw, nsLit((usLit(l).get + 1) * 1000)))
      case LessThan(MicrosOfNanos(raw), l) if usLit(l).isDefined =>
        Some(LessThan(raw, nsLit(usLit(l).get * 1000)))
      // flipped operand order: lit OP micros(ns)
      case GreaterThanOrEqual(l, MicrosOfNanos(raw)) if usLit(l).isDefined =>
        Some(LessThanOrEqual(raw, nsLit(usLit(l).get * 1000 + 999)))
      case LessThanOrEqual(l, MicrosOfNanos(raw)) if usLit(l).isDefined =>
        Some(GreaterThanOrEqual(raw, nsLit(usLit(l).get * 1000)))
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
