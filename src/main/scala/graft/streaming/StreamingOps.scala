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
