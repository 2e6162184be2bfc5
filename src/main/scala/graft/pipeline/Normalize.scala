package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema normalization — the reference's fuzzy, runtime-discovered schema
  * contract (`scripts/transform.py:44-64`, `scripts/stock_predictor.py:42-64`)
  * as one deterministic `DataFrame => DataFrame`.
  *
  * Semantics pinned from the reference (SURVEY.md §1.3, §7 "hard/risky"):
  *  - the datetime column is the FIRST (column order) whose lowercase name
  *    contains "datetime" (`transform.py:44`);
  *  - any column whose lowercase name contains open/high/low/close/volume is
  *    renamed to canonical `Open/High/Low/Close/Volume`; when several
  *    columns match one metric the LAST in column order wins (dict-overwrite
  *    tie-break, `transform.py:55`);
  *  - unparseable datetimes become null, not errors (`strict=False`,
  *    `transform.py:47`); tz-offset-suffixed strings (reference defect 6)
  *    parse correctly via the offset format falling back to the plain one;
  *  - a `symbol` literal is added only if absent (`transform.py:59-60`);
  *  - the output keeps exactly the canonical columns present
  *    (`transform.py:63-64`).
  *
  * All name logic runs driver-side over `df.columns` (names, not data — no
  * shuffle, no action); the data path is a single codegen'd projection.
  */
object Normalize {

  val metrics: Seq[String] = Seq("open", "high", "low", "close", "volume")
  val canonicalOrder: Seq[String] =
    Seq("Datetime", "Open", "High", "Low", "Close", "Volume", "symbol")

  def canonicalName(metric: String): String = metric.capitalize

  /** original-column → canonical-metric renames, last-match-wins both ways:
    * a column matching several metrics takes the last metric; several
    * columns matching one metric keep the last column. */
  def renameMap(cols: Seq[String]): Map[String, String] = {
    val colToMetric = scala.collection.mutable.LinkedHashMap[String, String]()
    for (c <- cols; m <- metrics if c.toLowerCase.contains(m))
      colToMetric(c) = canonicalName(m)
    colToMetric.toSeq.groupBy(_._2).map { case (canon, pairs) =>
      pairs.last._1 -> canon
    }
  }

  /** Columns that matched a metric but LOST the last-wins tie-break. They
    * must be dropped before renaming: if a loser's name is already exactly
    * canonical (e.g. "Close" losing to "Adj Close"), renaming the winner
    * would otherwise create a duplicate column name. */
  private def loserColumns(cols: Seq[String]): Seq[String] = {
    val winners = renameMap(cols).keySet
    cols.filter(c =>
      metrics.exists(m => c.toLowerCase.contains(m)) && !winners.contains(c))
  }

  /** Null-on-failure timestamp parse; accepts the reference's two observed
    * shapes: "yyyy-MM-dd HH:mm:ss±hh:mm" (defect-6 tz-suffixed) and plain
    * "yyyy-MM-dd HH:mm:ss". */
  def parseTimestamp(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ssXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")))

  /** Full normalization to the canonical inter-stage schema:
    * Datetime timestamp, Open/High/Low/Close double, Volume long, symbol. */
  def apply(df: DataFrame, symbol: Option[String] = None): DataFrame = {
    val dtCol = df.columns.find(_.toLowerCase.contains("datetime"))
    val withDt = dtCol match {
      case Some(c) if df.schema(c).dataType ==
          org.apache.spark.sql.types.TimestampType =>
        df.withColumn("__Datetime", col(c))
      case Some(c) => df.withColumn("__Datetime", parseTimestamp(col(c)))
      case None => df
    }
    val renames = renameMap(df.columns.toSeq)
    val deduped = loserColumns(df.columns.toSeq).foldLeft(withDt)(_.drop(_))
    val renamed = renames.foldLeft(deduped) { case (d, (orig, canon)) =>
      d.withColumnRenamed(orig, canon)
    }
    val typed = renamed.columns.foldLeft(renamed) { (d, c) =>
      c match {
        case "Open" | "High" | "Low" | "Close" =>
          d.withColumn(c, col(c).cast("double"))
        case "Volume" => d.withColumn(c, col(c).cast("long"))
        case _ => d
      }
    }
    val dtFinal =
      if (typed.columns.contains("__Datetime"))
        typed.drop("Datetime").withColumnRenamed("__Datetime", "Datetime")
      else typed
    val withSym = (symbol, dtFinal.columns.contains("symbol")) match {
      case (Some(s), false) => dtFinal.withColumn("symbol", lit(s))
      case _ => dtFinal
    }
    val keep = canonicalOrder.filter(withSym.columns.contains)
    withSym.select(keep.map(col): _*)
  }
}
