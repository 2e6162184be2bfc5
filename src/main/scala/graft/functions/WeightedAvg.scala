package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` example — the user-extensible aggregate
  * surface of the engine. Weighted average of `value` by weight `k`,
  * decomposed into partial sums so it map-side combines like any built-in
  * (mergeable buffer → shuffle carries 2 doubles per group, not rows). */
object WeightedAvg
    extends Aggregator[(Double, Long), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), e: (Double, Long)): (Double, Double) =
    (b._1 + e._1 * e._2, b._2 + e._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) 0.0 else b._1 / b._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
