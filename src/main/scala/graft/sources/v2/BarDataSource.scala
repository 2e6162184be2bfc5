package graft.sources.v2

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.HttpIngest

/** DataSourceV2 connector for the HTTP bar source — the DISTRIBUTED form
  * of ingest (SURVEY §2 row 1 maps the reference's per-symbol yFinance
  * loop; `HttpIngest.fetchAll` reproduces that driver-side parity shape,
  * while this connector is what the same contract looks like at fleet
  * scale):
  *
  *  - one `InputPartition` per symbol → each EXECUTOR fetches its own
  *    symbols in parallel; 10⁵ symbols = 10⁵ tasks, not a driver loop;
  *  - column pruning is pushed into the reader
  *    (`SupportsPushDownRequiredColumns`): a `select(symbol, Close)`
  *    materializes two fields per row at the source, nothing more;
  *  - options carry the plan-time config (`url` template with a
  *    `{symbol}` placeholder, comma-separated `symbols`), so the scan is
  *    fully serializable — no driver-captured clients.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.v2.BarSourceProvider")
  *   .option("url", "https://host/bars/{symbol}")
  *   .option("symbols", "AAPL,GOOG")
  *   .load()
  * }}}
  */
class BarSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BarTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new BarTable()
}

object BarTable {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("Datetime", TimestampType, nullable = false),
    StructField("Open", DoubleType, nullable = false),
    StructField("High", DoubleType, nullable = false),
    StructField("Low", DoubleType, nullable = false),
    StructField("Close", DoubleType, nullable = false),
    StructField("Volume", LongType, nullable = false)))
}

class BarTable extends Table with SupportsRead {
  override def name(): String = "graft_bars"
  override def schema(): StructType = BarTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val url = Option(options.get("url")).getOrElse(
      throw new IllegalArgumentException(
        "graft-bars requires an 'url' option with a {symbol} placeholder"))
    // a placeholder-free url would silently fetch ONE symbol's data under
    // every symbol's name — catch at plan time
    require(url.contains("{symbol}"),
      s"graft-bars url option must contain the {symbol} placeholder: $url")
    new BarScanBuilder(url,
      Option(options.get("symbols")).getOrElse(
        throw new IllegalArgumentException(
          "graft-bars requires a 'symbols' option (comma-separated)"))
        .split(",").map(_.trim).filter(_.nonEmpty).distinct.sorted)
  }
}

class BarScanBuilder(url: String, symbols: Array[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BarTable.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order; the scan must emit exactly this schema
    required = StructType(
      BarTable.schema.filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new BarScan(url, symbols, required)
}

class BarScan(url: String, symbols: Array[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    symbols.map(s => BarPartition(s): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new BarReaderFactory(url, required.fieldNames)
}

case class BarPartition(symbol: String) extends InputPartition

class BarReaderFactory(url: String, fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val symbol = partition.asInstanceOf[BarPartition].symbol
    new PartitionReader[InternalRow] {
      // field extractors resolved ONCE per reader — no per-row string
      // matching in the scan's hot path
      private val extractors: Array[HttpIngest.Bar => Any] = fields.map {
        case "symbol" =>
          (b: HttpIngest.Bar) => UTF8String.fromString(b.symbol)
        case "Datetime" => // micros since epoch (Spark's timestamp repr)
          (b: HttpIngest.Bar) => b.Datetime.getTime * 1000L +
            (b.Datetime.getNanos / 1000L) % 1000L
        case "Open" => (b: HttpIngest.Bar) => b.Open
        case "High" => (b: HttpIngest.Bar) => b.High
        case "Low" => (b: HttpIngest.Bar) => b.Low
        case "Close" => (b: HttpIngest.Bar) => b.Close
        case "Volume" => (b: HttpIngest.Bar) => b.Volume
      }
      // fetched lazily on the EXECUTOR, at first next() — task retries
      // re-fetch, task parallelism spreads symbols across the cluster
      private lazy val bars: Iterator[HttpIngest.Bar] =
        new HttpIngest.HttpCsvBarSource(
          s => url.replace("{symbol}", s)).fetch(symbol).iterator
      private var current: HttpIngest.Bar = _
      override def next(): Boolean =
        if (bars.hasNext) { current = bars.next(); true } else false
      override def get(): InternalRow =
        new GenericInternalRow(extractors.map(_(current)))
      override def close(): Unit = ()
    }
  }
}
