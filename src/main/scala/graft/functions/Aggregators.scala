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
    val cents = math.round(in._1 * 100)
    (b._1 + cents * in._2, b._2 + in._2)
  }

  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  def finish(r: (Long, Long)): Double =
    if (r._2 == 0L) 0.0 else r._1.toDouble / (100.0 * r._2)

  def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
