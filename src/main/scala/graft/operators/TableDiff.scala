package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed table — the audit
  * primitive behind incremental pipelines ("what did this run change?"),
  * data-contract monitoring, and CDC backfills. Complements [[Merge]]
  * (which APPLIES a changeset) by RECOVERING the changeset from two
  * materialized snapshots.
  *
  * Classification per key: `added` (key only in the new snapshot),
  * `removed` (only in the old), `changed` (present in both, any compared
  * column differs under null-safe equality), `unchanged` otherwise.
  *
  * 100 TB posture: one full-outer sort-merge join on the key — both
  * snapshots shuffle once by the same key, nothing is collected, and the
  * compare runs row-at-a-time in codegen. Only key + compared columns are
  * read, so column pruning reaches both scans. Duplicate keys within a
  * snapshot are the caller's contract violation (same as [[Merge]]);
  * they produce join fan-out rather than silent misclassification.
  */
object TableDiff {

  /** Per-key change rows: key columns + a `change` column. */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compare: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    val oldSel = oldDf.select((keys ++ compare).map(col): _*)
      .withColumn("_old_present", lit(true))
      .toDF(keys.map(k => s"_old_$k") ++ compare.map(c => s"_old_$c")
        :+ "_old_present": _*)
    val newSel = newDf.select((keys ++ compare).map(col): _*)
      .withColumn("_new_present", lit(true))
      .toDF(keys.map(k => s"_new_$k") ++ compare.map(c => s"_new_$c")
        :+ "_new_present": _*)
    val joinCond = keys.map(k => col(s"_old_$k") === col(s"_new_$k"))
      .reduce(_ && _)
    // null-safe inequality: a null↔value flip IS a change, null↔null isn't
    val differs = compare
      .map(c => !(col(s"_old_$c") <=> col(s"_new_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    oldSel.join(newSel, joinCond, "full_outer")
      .select(
        keys.map(k =>
          coalesce(col(s"_new_$k"), col(s"_old_$k")).as(k)) :+
        when(col("_old_present").isNull, "added")
          .when(col("_new_present").isNull, "removed")
          .when(differs, "changed")
          .otherwise("unchanged").as("change"): _*)
  }
}
