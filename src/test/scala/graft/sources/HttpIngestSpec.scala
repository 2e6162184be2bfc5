package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import graft.SparkSuite
import graft.sources.HttpIngest._

/** The HTTP pull source against a real (localhost) HTTP server: fetch,
  * parse, skip-on-empty, throttle cadence, and fail-fast on transport
  * errors — the reference ingestor's semantics
  * (stock_ingestor.py:20-27). */
class HttpIngestSpec extends SparkSuite {

  private val csvAAPL =
    """datetime,open,high,low,close,volume
      |2026-01-02T09:30:00Z,100.0,101.5,99.5,101.0,1000
      |2026-01-02T09:31:00Z,101.0,102.0,100.5,101.5,800""".stripMargin

  private def withServer[A](routes: Map[String, (Int, String)])(f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, (code, body)) =>
      server.createContext(path, ex => {
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
        ex.close()
      })
    }
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  test("fetches and parses bars over real HTTP; empty body skips; 404 throws") {
    withServer(Map(
      "/bars/AAPL" -> (200, csvAAPL),
      "/bars/EMPT" -> (200, "datetime,open,high,low,close,volume\n"),
      "/bars/BAD" -> (404, "gone"))) { port =>
      val src = new HttpCsvBarSource(s => s"http://127.0.0.1:$port/bars/$s")
      val bars = src.fetch("AAPL")
      assert(bars.length == 2)
      assert(bars.head.Close == 101.0 && bars.head.Volume == 1000L)
      assert(bars.head.Datetime.toInstant.toString == "2026-01-02T09:30:00Z")
      assert(src.fetch("EMPT").isEmpty)
      val e = intercept[java.io.IOException] { src.fetch("BAD") }
      assert(e.getMessage.contains("404"))
    }
  }

  test("fetchAll throttles between symbols, skips empties, builds the bar schema") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stub = new BarSource {
      override def fetch(symbol: String): Seq[Bar] = symbol match {
        case "EMPT" => Seq.empty
        case s => parseCsv(csvAAPL, s)
      }
    }
    val df = fetchAll(spark, stub, Seq("GOOG", "AAPL", "EMPT"),
      throttleMs = 1000, sleeper = sleeps.append(_))
    // one throttle gap between each consecutive request (n-1 sleeps)
    assert(sleeps.toSeq == Seq(1000L, 1000L))
    assert(df.columns.toSeq ==
      Seq("symbol", "Datetime", "Open", "High", "Low", "Close", "Volume"))
    assert(df.select("symbol").distinct().count() == 2) // EMPT skipped
  }

  test("fetchAll output feeds the pipeline Ingest stage unchanged") {
    val stub = new BarSource {
      override def fetch(symbol: String): Seq[Bar] = parseCsv(csvAAPL, symbol)
    }
    val bars = fetchAll(spark, stub, Seq("AAPL"), throttleMs = 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_http").toString
    val syms = graft.pipeline.Pipeline.Ingest.run(spark, bars, dir, "t0")
    assert(syms == Seq("AAPL"))
    val raw = spark.read.json(s"$dir/AAPL_stock_raw_t0.json")
    assert(raw.count() == 2)
    assert(raw.columns.contains("Close_AAPL"))
  }
}
