package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SURVEY.md §2j — the one custom `Aggregator[IN,BUF,OUT]` UDAF surface
  * proof (reference has no user-function framework; all its logic is
  * compiled Java).
  *
  * Weighted average in exact integer cents: values are scaled to
  * Long cents at input, so merge order never changes the result (double
  * summation would be order-dependent across partitions and break the
  * DuckDB hash-match). Buffer is a pair of Longs → tiny shuffle payload;
  * merge is associative+commutative → map-side partial aggregation works.
  */
object WeightedAvgCents
    extends Aggregator[(Double, Long), (Long, Long), Double] {

  /** (sum of value-cents × weight, sum of weights) */
  def zero: (Long, Long) = (0L, 0L)

  def reduce(b: (Long, Long), in: (Double, Long)): (Long, Long) = {
    // fail LOUDLY on non-finite values: math.round(NaN) is 0 and
    // round(±Inf) saturates to Long.Max/Min, so an unfenced NaN price
    // would count its weight against a phantom 0-cent value — a finite,
    // wrong average where the oracle's DECIMAL cast errors out. Loud
    // beats silently-plausible; the registered key feeds real prices.
    require(java.lang.Double.isFinite(in._1),
      s"weighted_avg_cents: non-finite value ${in._1}")
    // half-AWAY-FROM-ZERO like DuckDB's round(): math.round is
    // floor(x+0.5), which sends -2.5 to -2 where the oracle says -3 —
    // invisible on non-negative prices, a one-cent divergence the day
    // the domain admits negatives
    val scaled = in._1 * 100
    val cents = if (scaled >= 0) math.round(scaled)
                else -math.round(-scaled)
    (b._1 + cents * in._2, b._2 + in._2)
  }

  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  // zero total weight yields 0.0 by convention; unreachable from the
  // registered key (weights are p_size >= 1 and groups are non-empty),
  // so the oracle does not spell the branch
  def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1.toDouble / (100.0 * r._2)

  def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
