package graft.operators

import graft.SparkSuite
import graft.queries.TemporalQueries
import org.apache.spark.sql.functions._

/** Forward as-of semantics pins — especially the same-instant tie, which
  * the testdata never exercises (a review simulation showed the inverted
  * kind ordering silently dropped same-ts purchases while the oracle kept
  * them). */
class ForwardAsofSpec extends SparkSuite {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, String, java.lang.Double)*) =
    rows.toSeq
      .toDF("event_id", "user_id", "us", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)"))
      .drop("us")

  private def matchOf(df: org.apache.spark.sql.DataFrame,
      click: Long): Option[Long] =
    df.filter(col("event_id") === click)
      .select("next_purchase_eid")
      .collect().headOption.flatMap(r => Option(r.get(0)).map(_ => r.getLong(0)))

  test("a purchase at the click's exact timestamp IS the next purchase") {
    val e = events(
      (1L, 7L, 1000L, "click", null),
      (2L, 7L, 1000L, "purchase", 5.0),
      (3L, 7L, 2000L, "purchase", 9.0))
    assert(matchOf(TemporalQueries.forwardAsof(e), 1L) === Some(2L))
  }

  test("ties among same-instant purchases break on event_id") {
    val e = events(
      (1L, 7L, 1000L, "click", null),
      (5L, 7L, 1000L, "purchase", 5.0),
      (4L, 7L, 1000L, "purchase", 9.0))
    assert(matchOf(TemporalQueries.forwardAsof(e), 1L) === Some(4L))
  }

  test("earlier purchases are never matched; missing future leaves null") {
    val e = events(
      (2L, 7L, 500L, "purchase", 5.0),
      (1L, 7L, 1000L, "click", null))
    assert(matchOf(TemporalQueries.forwardAsof(e), 1L) === None)
  }

  test("unpriced purchases are skipped in favor of the next priced one") {
    val e = events(
      (1L, 7L, 1000L, "click", null),
      (2L, 7L, 1500L, "purchase", null),
      (3L, 7L, 2000L, "purchase", 9.0))
    assert(matchOf(TemporalQueries.forwardAsof(e), 1L) === Some(3L))
  }

  test("matching never crosses users") {
    val e = events(
      (1L, 7L, 1000L, "click", null),
      (2L, 8L, 1500L, "purchase", 5.0))
    assert(matchOf(TemporalQueries.forwardAsof(e), 1L) === None)
  }
}
