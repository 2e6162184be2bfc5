package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC-style incremental merge: apply a change batch (upserts + delete
  * tombstones) to a snapshot, newest version wins per key — the
  * maintenance operation behind every incrementally-updated table (the
  * reference's pipeline rebuilds zones wholesale each run; at 100 TB a
  * daily delta is merged, not a rebuild).
  *
  * Mechanics: one union + one window pass partitioned by the key —
  * exactly the `LatestPerKey` shape, so cost is a single shuffle of
  * snapshot+delta on the key. Ties on `versionCol` resolve to the DELTA
  * row (a same-version correction in the batch beats the stale snapshot
  * row — deterministic, and what CDC consumers expect). Rows whose
  * winning version carries the tombstone are dropped at the end, which
  * deletes a key when the delta says so REGARDLESS of how many snapshot
  * versions it had.
  */
object Merge {

  /** `snapshot` and `delta` must share the schema apart from `delta`'s
    * optional boolean `deletedCol` (absent ⇒ pure upserts; a NULL flag
    * reads as not-deleted — an upsert batch unioned with
    * allowMissingColumns must not silently delete). Returns the merged
    * snapshot (without the tombstone column).
    *
    * Determinism: the winner is total-ordered by (version desc, delta-
    * over-snapshot, `tieBreakCols`). If a single batch can carry several
    * rows for one (key, version) — replayed/duplicated change events —
    * pass `tieBreakCols` to make the choice deterministic; with none,
    * each (key, version, side) must be unique or the survivor is
    * partition-order-dependent. */
  def upsert(snapshot: DataFrame, delta: DataFrame, keyCols: Seq[String],
      versionCol: String, deletedCol: String = "_deleted",
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val withFlag =
      if (delta.columns.contains(deletedCol)) delta
      else delta.withColumn(deletedCol, lit(false))
    val tagged = snapshot
      .withColumn(deletedCol, lit(false))
      .withColumn("__src", lit(0))
      .unionByName(withFlag.withColumn("__src", lit(1)))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(versionCol).desc +: col("__src").desc +:
        tieBreakCols.map(col(_).desc): _*)
    tagged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !coalesce(col(deletedCol), lit(false)))
      .drop("__rn", "__src", deletedCol)
  }
}
