package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured Streaming variant of the engine (SURVEY.md §2.8 / §7 phase E).
  * The reference's cadence is a daily batch pull; these operators give the
  * same transforms continuous semantics: event-time tumbling windows with
  * watermarks, gap-based session windows, and custom keyed state.
  *
  * Every operator is a pure DataFrame/Dataset transform usable on both
  * batch and streaming inputs (the batch twin of `hourlyAgg` is query
  * q23_hourly_bucket, which the DuckDB oracle checks), so correctness is
  * pinned in batch and the streaming path only adds trigger/watermark
  * mechanics. State is bounded by the watermark — required for unbounded
  * 100 TB/day streams.
  */
object StreamingOps {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class UserStats(user_id: Long, n: Long, sum_value: Double)

  /** Hourly tumbling-window aggregation with a 1-hour watermark. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity gap) per user. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Sliding 7-day / 1-day-slide approximate distinct users — the
    * streaming face of q133's rolling DAU. Exact distinct cannot stream
    * over sliding frames (distinct doesn't decompose, and per-window
    * exact state would hold every user id seven times); HLL++ state is
    * O(sketch) per window and merges incrementally, which is precisely
    * the q133 scaladoc's documented 100 TB path. Windows align to UTC
    * midnights (epoch-aligned daily slide), so window.end − 1 day IS the
    * batch query's day key; StreamingSpec pins the ≤5% agreement against
    * the exact batch twin. */
  def rollingDau(events: DataFrame, rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", "8 days")
      .groupBy(window(col("ts"), "7 days", "1 day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("approx_dau"))
      .select(col("window.end").as("win_end"), col("approx_dau"))

  /** Stream-stream interval join: each purchase joins the clicks of the
    * same user within the preceding hour. Both sides carry watermarks and
    * the join condition bounds event-time distance, so state on both sides
    * is watermark-bounded — the requirement for an unbounded stream-stream
    * join. (Batch inputs run the identical plan as a plain interval join.)
    * `joinType = "left_outer"` additionally emits each clickless purchase
    * ONCE, null-padded, when the watermark proves no matching click can
    * still arrive — the streaming form of "purchases without attribution",
    * impossible to state correctly without watermark-driven state expiry. */
  def purchaseClickJoin(events: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_uid"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_uid") === col("c_uid") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      joinType)
      .select(col("p_id"), col("p_uid").as("user_id"), col("p_ts"),
        col("c_id"), col("c_ts"))
  }

  /** Streaming dedup: one row per `fingerprint`, with state bounded by the
    * watermark — the streaming counterpart of the exact-dedup operator
    * (queries q40/q67 dedup a bounded corpus; an unbounded ingest stream
    * needs the dedup keys to EXPIRE or state grows forever). Duplicates
    * arriving within `horizon` of the original are dropped; rows older
    * than the watermark are beyond the dedup horizon by declaration.
    * (On a batch input this is a plain dropDuplicates.) */
  def dedupStream(rows: DataFrame, fingerprintCol: String, tsCol: String,
      horizon: String = "1 hour"): DataFrame = {
    val wm = rows.withWatermark(tsCol, horizon)
    if (rows.isStreaming)
      wm.dropDuplicatesWithinWatermark(fingerprintCol)
    else wm.dropDuplicates(fingerprintCol)
  }

  /** OHLC bar aggregation — the streaming twin of q111 (the reference's
    * stock-bar domain on an unbounded tick stream): per (event_type,
    * tumbling bar), open/close are picked by `min_by`/`max_by` on the
    * (ts, event_id) order — DECLARATIVE aggregates, because the batch
    * formulation's row_number flags need a finished partition and cannot
    * run over unbounded input. High/low/count are plain aggs; values are
    * integer cents (the engine-shared floor-form round); state is one
    * bar row per open window, expired by the watermark. On a batch input
    * the identical plan computes the same bars (equality pinned in
    * StreamingSpec, including against the batch row_number formulation). */
  def ohlcBars(events: DataFrame, width: String = "1 hour"): DataFrame =
    events.filter(col("value").isNotNull)
      .withColumn("cents", graft.functions.Rounding.cents(col("value")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        min_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("open_cents"),
        max("cents").as("high_cents"),
        min("cents").as("low_cents"),
        max_by(col("cents"), struct(col("ts"), col("event_id")))
          .as("close_cents"),
        count(lit(1)).as("n_ticks"))
      .select(col("window.start").as("bar_start"), col("event_type"),
        col("open_cents"), col("high_cents"), col("low_cents"),
        col("close_cents"), col("n_ticks"))

  case class Burst(user_id: Long, burst_end_us: Long, n_in_window: Int)

  /** Complex-event detection via flatMapGroupsWithState: emit an alert
    * whenever a user's `n`-th purchase lands within `windowUs` of the
    * (n−1)-back one — the sliding-count burst pattern (fraud velocity
    * checks, crawler rate flags). State per user is the last n−1 purchase
    * timestamps — BOUNDED by construction, not by watermark, so an
    * unbounded stream holds O(users · n) state.
    *
    * Rows are sorted by (ts, event_id) INSIDE the group function: a batch
    * input delivers the whole group as one unordered iterator, and a
    * streaming input delivers each micro-batch's slice unordered — sorting
    * per invocation makes the batch twin deterministic and keeps
    * micro-batch boundaries from reordering within a batch. (Cross-batch
    * late data is the caller's watermark contract, as with every stateful
    * op here.) Alerts per event, not per window: each qualifying purchase
    * emits exactly one row, so the output is idempotent under re-grouping
    * — equality with the batch window-frame formulation is pinned in
    * StreamingSpec. */
  def burstDetect(events: Dataset[Event], n: Int = 3,
      windowUs: Long = 10L * 60 * 1000 * 1000): Dataset[Burst] = {
    // n = 1 would mean "alert on every purchase" — express that as a
    // filter, not a state machine (and n - 1 = 0 state entries would
    // index an empty list below)
    require(n >= 2 && windowUs > 0, "need n >= 2 and a positive window")
    import events.sparkSession.implicits._
    events
      .filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Long], Burst](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[List[Long]]) =>
          // full microsecond precision, matching unix_micros: getTime is
          // ms (floor the SECONDS part — plain / truncates toward zero
          // and would misorder pre-epoch timestamps), nanos carry the
          // sub-second part
          def usOf(t: java.sql.Timestamp): Long =
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          var recent = state.getOption.getOrElse(Nil) // ascending, ≤ n-1
          val alerts = scala.collection.mutable.ListBuffer.empty[Burst]
          batch.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
            val us = usOf(e.ts)
            if (recent.length >= n - 1 && us - recent(recent.length - (n - 1))
                <= windowUs)
              alerts += Burst(user, us, n)
            recent = (recent :+ us).takeRight(n - 1)
          }
          state.update(recent)
          alerts.iterator
      }
  }

  case class VecEntry(id: Long, v: Seq[Double])
  case class NearDupPair(band: Int, id_a: Long, id_b: Long, cos_e6: Long)

  /** Streaming near-dup over embeddings, keyed on LSH band keys — the
    * continuous-ingest counterpart of the batch banded near-dup (q44)
    * for a corpus that never stops arriving: a 100 TB/day crawl cannot
    * re-run batch LSH nightly over everything ever seen, it needs each
    * arriving vector screened against the standing index.
    *
    * Composition, per the q246/burstDetect pattern: the STATELESS front
    * end is the exact batch banding machinery ([[graft.operators.Lsh
    * .bandKeysCol]] — same md5-seeded hyperplanes, so stream and batch
    * agree bit-for-bit on bucket membership), exploded to one row per
    * (vector, band). The STATEFUL core is flatMapGroupsWithState keyed
    * by (band, bkey): state is the bucket's standing members; each new
    * vector emits a pair against every standing member whose exact
    * cosine (same left-fold order as the native cosine_sim expression —
    * bit-identical doubles) clears `minCosE6`, then joins the bucket.
    *
    * Pair-set semantics are ARRIVAL-ORDER-FREE: an unordered pair
    * {a, b} sharing a bucket is emitted exactly once per shared band —
    * when its second member arrives — regardless of how micro-batches
    * split the input (within a batch, members are processed in id order
    * for determinism). So any streaming schedule produces the same
    * multiset of (band, id_a, id_b, cos_e6) rows as the one-batch run,
    * which in turn equals the declarative batch bucket-join WHILE
    * EVERY BUCKET STAYS BELOW `maxPerBucket` (the capped regime trades
    * recall, never consistency — see below) — the
    * equality StreamingSpec pins. Cross-band duplicates of the same id
    * pair are the caller's distinct(), exactly as in batch LSH.
    *
    * State is bounded per bucket by `maxPerBucket` — the df-gate
    * argument from the shingle miners, applied with the df-gate's exact
    * semantics: once a bucket is full, later arrivals are DROPPED from
    * that bucket entirely (no pairs, no state change), just as a
    * past-cap shingle stops generating candidates. The softer
    * alternative — screen new arrivals against the capped membership
    * without recording them — would silently break the exactly-once
    * pair contract under at-least-once delivery (a redelivered
    * unrecorded id would re-emit its pairs), so the recall loss is
    * taken loudly at the cap instead. A degenerate bucket (the
    * all-zeros region every boilerplate vector hashes into) is exactly
    * where both state AND fan-out must stop growing. Production would
    * also expire members by event-time; the cap is the load-bearing
    * bound. */
  def nearDupStream(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, bands: Int = 32, rowsPerBand: Int = 4,
      minCosE6: Long = 900000L, maxPerBucket: Int = 1000)
      : Dataset[NearDupPair] = {
    import vectors.sparkSession.implicits._
    val planes = graft.operators.Lsh.hyperplanes(bands * rowsPerBand, dim)
    val banded = vectors
      .select(col(idCol).cast("long").as("id"),
        expr(s"transform($vecCol, x -> cast(x AS double))").as("v"))
      .select(col("id"), col("v"),
        posexplode(graft.operators.Lsh
          .bandKeysCol(col("v"), planes, bands, rowsPerBand)))
      .toDF("id", "v", "band", "bkey")
      .as[(Long, Seq[Double], Int, String)]
    // same fused left-fold as expressions.CosineSimilarity.nullSafeEval —
    // identical op order on identical doubles ⇒ identical result, so the
    // stateful path and the declarative batch twin cannot ulp-diverge
    def cosE6(a: Seq[Double], b: Seq[Double]): Option[Long] = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) None
      else Some(math.floor(
        dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6 + 0.5).toLong)
    }
    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[VecEntry], NearDupPair](
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (key: (Int, String), batch: Iterator[(Long, Seq[Double], Int, String)],
            state: GroupState[List[VecEntry]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer.empty[NearDupPair]
          batch.toSeq.sortBy(_._1).foreach { case (id, v, band, _) =>
            // replay guard: a re-delivered id must not pair with itself
            // or double-enter the bucket (at-least-once sources). A FULL
            // bucket drops the arrival entirely (see the cap contract in
            // the scaladoc) — pairing without recording would re-emit on
            // redelivery.
            if (seen.length < maxPerBucket && !seen.exists(_.id == id)) {
              seen.foreach { e =>
                cosE6(e.v, v).foreach { c =>
                  if (c >= minCosE6)
                    out += NearDupPair(band,
                      math.min(e.id, id), math.max(e.id, id), c)
                }
              }
              seen = seen :+ VecEntry(id, v)
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Custom keyed state via mapGroupsWithState: running per-user count and
    * value sum across micro-batches. */
  def runningUserStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats] {
        (user: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, 0.0))
          val (n, s) = batch.foldLeft((prev.n, prev.sum_value)) {
            case ((cn, cs), e) => (cn + 1, cs + e.value)
          }
          val next = UserStats(user, n, s)
          state.update(next)
          next
      }
  }
}
