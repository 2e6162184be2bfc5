package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored row for the bounded top-k aggregate: `value` ranks (higher is
  * better), `id` breaks ties ascending and identifies the row. */
case class Scored(value: Double, id: Long)

/** Bounded top-k per group as a typed aggregate, the scale-safe alternative
  * to `row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`.
  *
  * The window form shuffles EVERY row to its group's reducer and sorts the
  * whole group; this aggregate keeps at most k rows per group per map task
  * (partial aggregation — Spark plans typed aggregates with a map-side
  * combine), so the exchange carries ≤ k·groups·tasks rows instead of all of
  * them and no full per-group sort ever happens. At 100 TB with k=3 that is
  * the difference between shuffling the table and shuffling a rounding
  * error of it.
  *
  * Ordering contract (must match the oracle's window ORDER BY exactly):
  * value DESC, id ASC. The buffer is a sorted Vector rather than a heap —
  * for the small k this is built for (k ≤ ~100), sorting k+1 elements on
  * insert beats heap bookkeeping and keeps merge trivial.
  */
class TopKByValue(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def best: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.value, s.id))

  def zero: Seq[Scored] = Vector.empty

  def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = {
    // skip the sort when the candidate can't displace a full buffer
    if (b.size >= k && best.gteq(a, b.last)) b
    else ((b :+ a).sorted(best)).take(k)
  }

  def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(best).take(k)

  def finish(b: Seq[Scored]): Seq[Scored] = b.sorted(best).take(k)

  // array<struct<value,id>> in the shuffle — compact, columnar-friendly
  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()

  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}
