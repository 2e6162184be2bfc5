package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality gate (SURVEY §5: the reference installs
  * great_expectations and never calls it — this is the working equivalent,
  * reference `docker-compose.yml:32`).
  *
  * Design for 100 TB: every row-level check compiles to ONE conditional
  * count inside a SINGLE aggregation over the data — adding checks adds
  * agg expressions, never extra scans or shuffles (the aggregate is global,
  * so Spark computes partials map-side and merges 32-ish tiny rows).
  * Schema checks are plan-time only (no scan at all). The report comes
  * back as a DataFrame so it can be persisted next to the data it
  * describes, and gates compose with `require`.
  */
object DataQuality {

  sealed trait Check { def name: String; def column: String }
  /** Column must exist (plan-time). */
  case class HasColumn(column: String) extends Check { val name = "has_column" }
  /** No nulls in `column`. */
  case class NotNull(column: String) extends Check { val name = "not_null" }
  /** All non-null values within [lo, hi]. */
  case class InRange(column: String, lo: Double, hi: Double) extends Check {
    val name = "in_range"
  }
  /** Row count within [min, max] (max = Long.MaxValue for "at least"). */
  case class RowCount(min: Long, max: Long = Long.MaxValue) extends Check {
    val name = "row_count"; val column = ""
  }
  /** `column` values are unique (no duplicate keys). */
  case class Unique(column: String) extends Check { val name = "unique" }

  /** Evaluate all checks; returns
    * (check, col, violations, total, passed) — one row per check, ordered
    * by (check, col) for determinism. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val present = df.columns.toSet

    // plan-time results (schema checks, and row-level checks on columns
    // that don't exist — those FAIL as missing rather than crash the agg)
    val planRows = checks.collect {
      case HasColumn(c) =>
        ("has_column", c, if (present(c)) 0L else 1L, 1L, present(c))
      case ck if ck.column.nonEmpty && !present(ck.column) =>
        (ck.name, ck.column, 1L, 1L, false)
    }

    val live = checks.filter(c =>
      !c.isInstanceOf[HasColumn] && (c.column.isEmpty || present(c.column)))

    val aggRows: Seq[(String, String, Long, Long, Boolean)] =
      if (live.isEmpty) Seq.empty
      else {
        def cnt(pred: Column): Column =
          sum(when(pred, lit(1L)).otherwise(lit(0L)))
        val total = count(lit(1)).as("__total")
        // Unique needs per-key counts, so it runs as its own (keyed,
        // map-side-combined) aggregation; everything else shares one pass.
        val scalarChecks = live.filter(!_.isInstanceOf[Unique])
        val aggs = scalarChecks.zipWithIndex.map {
          case (NotNull(c), i) => cnt(col(c).isNull).as(s"__v$i")
          case (InRange(c, lo, hi), i) =>
            cnt(col(c).isNotNull && (col(c) < lo || col(c) > hi)).as(s"__v$i")
          case (RowCount(_, _), i) => lit(0L).as(s"__v$i")
          case (ck, _) => throw new IllegalArgumentException(s"unhandled $ck")
        }
        val row =
          if (scalarChecks.isEmpty) df.agg(total).collect()(0)
          else df.agg(total, aggs: _*).collect()(0)
        val n = row.getLong(0)
        val scalarRows = scalarChecks.zipWithIndex.map {
          case (RowCount(min, max), _) =>
            val bad = if (n >= min && n <= max) 0L else 1L
            ("row_count", "", bad, n, bad == 0L)
          case (ck, i) =>
            val v = if (row.isNullAt(i + 1)) 0L else row.getLong(i + 1)
            (ck.name, ck.column, v, n, v == 0L)
        }
        val uniqueRows = live.collect { case Unique(c) =>
          val dups = df.groupBy(col(c)).agg(count(lit(1)).as("__n"))
            .filter(col("__n") > 1)
            .agg(coalesce(sum(col("__n") - 1), lit(0L))).collect()(0).getLong(0)
          ("unique", c, dups, n, dups == 0L)
        }
        scalarRows ++ uniqueRows
      }

    (planRows ++ aggRows)
      .toDF("check", "col", "violations", "total", "passed")
      .orderBy("check", "col")
  }

  /** Gate form: throw with the offending report rows if any check fails. */
  def enforce(df: DataFrame, checks: Seq[Check], what: String): Unit = {
    val rep = report(df, checks)
    val bad = rep.filter(!col("passed")).collect()
    require(bad.isEmpty,
      s"data-quality gate failed for $what: " +
        bad.map(r => s"${r.getString(0)}(${r.getString(1)}) " +
          s"violations=${r.getLong(2)}/${r.getLong(3)}").mkString("; "))
  }

  /** The bar-data contract the pipeline's processed zone must satisfy
    * before Combine may union it (wired in Pipeline.run); names are the
    * canonical inter-stage schema (Normalize.canonicalOrder). */
  def barChecks: Seq[Check] = Seq(
    HasColumn("symbol"), HasColumn("Datetime"), HasColumn("Close"),
    NotNull("symbol"), NotNull("Datetime"),
    RowCount(min = 1))
}
