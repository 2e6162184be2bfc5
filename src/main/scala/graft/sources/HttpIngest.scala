package graft.sources

import java.io.InputStream
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import java.time.OffsetDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}

/** HTTP pull-source adapter (SURVEY §2 row 1): the reference's ingest is a
  * driver-side per-symbol HTTP fetch with a 1 s throttle and a skip-on-empty
  * guard (`scripts/stock_ingestor.py:20-27`). This closes the row from
  * "adapter only" to a working fetch → DataFrame path behind the same
  * `Pipeline.Ingest` seam: `fetchAll` produces exactly the canonical bar
  * schema Ingest consumes.
  *
  * Scale note, stated honestly: a per-symbol driver loop is the PARITY
  * shape (the reference throttles to be polite to a public API — the loop
  * IS the rate limiter, so distributing it buys nothing and loses the
  * global throttle). The 100 TB paths of this engine ingest from bulk
  * storage via `Formats`/`Tables`; an HTTP API is a control-plane source.
  */
object HttpIngest {

  /** Canonical bar row — field names/order match `Pipeline.Ingest`'s
    * expected schema (symbol, Datetime, Open, High, Low, Close, Volume). */
  case class Bar(symbol: String, Datetime: Timestamp, Open: Double,
      High: Double, Low: Double, Close: Double, Volume: Long)

  /** One symbol's bars. Empty = provider had nothing (the caller skips the
    * symbol, reference `:25-27`); a thrown exception = provider/transport
    * error (fail fast — the reference would surface a requests error the
    * same way). */
  trait BarSource {
    def fetch(symbol: String): Seq[Bar]
  }

  /** CSV-over-HTTP source: GET `urlFor(symbol)`, response body is
    * header-prefixed CSV `datetime,open,high,low,close,volume` with ISO
    * offset datetimes. An empty body or a bare header means "no data"
    * (→ empty Seq, skip); a non-200 status throws. */
  final class HttpCsvBarSource(urlFor: String => String,
      timeoutMs: Int = 10000) extends BarSource {
    override def fetch(symbol: String): Seq[Bar] = {
      val conn = URI.create(urlFor(symbol)).toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      try {
        val code = conn.getResponseCode
        if (code != 200)
          throw new java.io.IOException(s"GET for $symbol returned $code")
        parseCsv(readAll(conn.getInputStream), symbol)
      } finally conn.disconnect()
    }
  }

  private def readAll(in: InputStream): String =
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()

  /** Parse the bar CSV (header tolerated, blank lines ignored). */
  def parseCsv(body: String, symbol: String): Seq[Bar] =
    body.split("\n").iterator
      .map(_.trim).filter(_.nonEmpty)
      .filterNot(_.toLowerCase.startsWith("datetime"))
      .map { line =>
        val f = line.split(",").map(_.trim)
        require(f.length == 6, s"bad bar line for $symbol: $line")
        Bar(symbol,
          Timestamp.from(OffsetDateTime.parse(f(0)).toInstant),
          f(1).toDouble, f(2).toDouble, f(3).toDouble, f(4).toDouble,
          f(5).toLong)
      }.toSeq

  /** Fetch every symbol through `source` with `throttleMs` between
    * requests (reference's `time.sleep(1)`), skipping symbols with no
    * data, and assemble one bars DataFrame ready for `Pipeline.Ingest`.
    * `sleeper` is injectable so tests don't wall-clock-sleep. */
  def fetchAll(spark: SparkSession, source: BarSource, symbols: Seq[String],
      throttleMs: Long = 1000,
      sleeper: Long => Unit = Thread.sleep): DataFrame = {
    import spark.implicits._
    val bars = symbols.sorted.zipWithIndex.flatMap { case (sym, i) =>
      if (i > 0 && throttleMs > 0) sleeper(throttleMs)
      source.fetch(sym)
    }
    bars.toDF()
  }
}
