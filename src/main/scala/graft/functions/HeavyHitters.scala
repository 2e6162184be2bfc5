package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch as a typed aggregate: bounded state
  * (≤ `k` counters per partial), mergeable, and with the classical
  * guarantee that every item with true frequency > N/(k+1) SURVIVES in the
  * final candidate set (counts are underestimates; impostors may ride
  * along). The intended 100 TB usage is the two-pass exact heavy hitters
  * in q83: this sketch finds a tiny candidate set in one map-side-bounded
  * aggregation, then one semi-join + count refines to EXACT counts — the
  * full groupBy of a multi-billion-key long tail never happens, and the
  * shuffle carries ≤ k counters per task instead of one row per distinct
  * key.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries"): sum counters, and
  * if more than k survive, subtract the (k+1)-th largest count from all
  * and drop the non-positive — the decrement step of the streaming
  * algorithm applied in bulk, which preserves the guarantee because each
  * subtraction decrements ≤ count(true item) from every counter while
  * charging the same amount against ≥ k+1 items' worth of stream mass. */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {

  require(k >= 1, "need at least one counter")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all: drop one unit of mass from every counter (and the
        // unmatched item), evicting whatever hits zero
        b.flatMap { case (w, c) => if (c > 1) Some(w -> (c - 1)) else None }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long])
      : Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (w, c) =>
        if (c > cut) Some(w -> (c - cut)) else None
      }
    }
  }

  /** Sorted candidate words — counts are deliberately NOT exposed (they
    * are underestimates; the exact pass supplies real counts). */
  override def finish(b: Map[String, Long]): Seq[String] =
    b.keys.toSeq.sorted

  // map<string,bigint> buffer / array<string> output — both columnar
  // catalyst shapes, no java serialization in the shuffle
  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
