package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions._
import graft.SparkSuite

/** The DataSourceV2 bar connector against a real localhost HTTP server:
  * schema, values, one-partition-per-symbol parallelism, and column
  * pruning pushed into the reader. */
class BarDataSourceSpec extends SparkSuite {

  private def csv(base: Double) =
    s"""datetime,open,high,low,close,volume
       |2026-01-02T09:30:00Z,${base},${base + 1},${base - 1},${base + 0.5},1000
       |2026-01-02T09:31:00Z,${base + 0.5},${base + 2},${base},${base + 1.0},800""".stripMargin

  private def withServer[A](f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    Seq("AAA" -> 100.0, "BBB" -> 200.0, "CCC" -> 300.0).foreach {
      case (sym, base) =>
        server.createContext(s"/bars/$sym", ex => {
          val bytes = csv(base).getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        })
    }
    server.start()
    try f(server.getAddress.getPort) finally server.stop(0)
  }

  private def read(port: Int) = spark.read
    .format("graft.sources.v2.BarSourceProvider")
    .option("url", s"http://127.0.0.1:$port/bars/{symbol}")
    .option("symbols", "BBB,AAA,CCC")
    .load()

  test("reads all symbols with the canonical schema and values") {
    withServer { port =>
      val df = read(port)
      assert(df.columns.toSeq ==
        Seq("symbol", "Datetime", "Open", "High", "Low", "Close", "Volume"))
      assert(df.count() == 6)
      val aaa = df.filter(col("symbol") === "AAA")
        .orderBy("Datetime").collect()
      assert(aaa.length == 2)
      assert(aaa(0).getDouble(5) == 100.5) // Close
      assert(aaa(0).getTimestamp(1).toInstant.toString ==
        "2026-01-02T09:30:00Z")
    }
  }

  test("placeholder-free url fails at plan time; duplicate symbols dedupe") {
    withServer { port =>
      val e = intercept[IllegalArgumentException] {
        spark.read.format("graft.sources.v2.BarSourceProvider")
          .option("url", s"http://127.0.0.1:$port/bars/AAA")
          .option("symbols", "AAA,BBB").load().count()
      }
      assert(e.getMessage.contains("{symbol}"))
      val dup = spark.read.format("graft.sources.v2.BarSourceProvider")
        .option("url", s"http://127.0.0.1:$port/bars/{symbol}")
        .option("symbols", "AAA,BBB,AAA").load()
      assert(dup.rdd.getNumPartitions == 2)
      assert(dup.count() == 4)
    }
  }

  test("plans one input partition per symbol (distributed fetch)") {
    withServer { port =>
      val df = read(port)
      assert(df.rdd.getNumPartitions == 3)
      // each partition holds exactly one symbol's rows
      val perPart = df.select("symbol").rdd
        .mapPartitions(it => Iterator(it.map(_.getString(0)).toSet.size))
        .collect()
      assert(perPart.toSeq == Seq(1, 1, 1))
    }
  }

  test("column pruning reaches the reader: scan emits only selected fields") {
    withServer { port =>
      val pruned = read(port).select("symbol", "Close")
      val scan = pruned.queryExecution.executedPlan.collectLeaves().head
      assert(scan.output.map(_.name) == Seq("symbol", "Close"),
        s"scan still emits ${scan.output.map(_.name)}")
      assert(pruned.distinct().count() == 6)
    }
  }
}
