package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Two-slot LRU per-(session, dir) memo for an expensive shared stage,
  * materialized behind an eager localCheckpoint — the build-once pattern
  * the dedup pair graph, its CC closure, and the identity stitch all
  * share (each feeds 3–7 standalone queries that would otherwise rebuild
  * a bit-identical table).
  *
  * A FIXED slot count, deliberately: a cached DataFrame strongly
  * references its SparkSession, so a weak-keyed map can never actually
  * release entries (the classic WeakHashMap value-refers-to-key defect —
  * the round-10 form of this memo documented weak keys that could not
  * fire). A hard bound makes the retention EXPLICIT instead of
  * aspirational: at most two (session, dir) builds are pinned, and the
  * least-recently-used is dropped the moment a third key comes through —
  * so a stopped session is held only until two newer builds, never for
  * the JVM's life; the evicted checkpoint's blocks are unpersisted
  * eagerly at eviction (best-effort), not left to GC + ContextCleaner.
  *
  * Two slots, not one (round-11 verdict item 5): the driver's real
  * access pattern interleaves TWO dirs in one session — the correctness
  * run at sf0.01 and the bench at sf0.1 — and a single slot silently
  * rebuilds the whole multi-consumer chain on every dir switch. Two
  * keeps both warm; anything beyond two has no driver-shaped consumer
  * and only raises the retention bound.
  *
  * `get` is synchronized: concurrent first callers (q299-style threaded
  * arms) build once, not twice. Builds must be DETERMINISTIC — every
  * consumer and the oracle see identical rows whether they hit a slot
  * or a cold build — and must return an ALREADY-MATERIALIZED frame
  * (eager localCheckpoint at the call site: some builds need to release
  * intermediate caches only after materialization, so the memo cannot
  * own the checkpoint ordering). */
private[graft] class SessionDirMemoOf[V](frames: V => Seq[DataFrame]) {
  private val capacity = 2
  // most-recently-used first; length ≤ capacity
  private var slots: List[(SparkSession, String, V)] = Nil

  def get(s: SparkSession, dir: String)(build: => V): V =
    synchronized {
      slots.find { case (ss, d, _) => (ss eq s) && d == dir } match {
        case Some(hit @ (_, _, v)) =>
          slots = hit :: slots.filterNot(_ eq hit)
          v
        case None =>
          val built = build
          val (kept, evicted) = ((s, dir, built) :: slots).splitAt(capacity)
          slots = kept
          // Release the evicted build's checkpoint blocks NOW (ADVICE
          // r12) instead of waiting for GC + ContextCleaner to notice the
          // dropped reference — a stale sf-dir's blocks otherwise linger
          // for an unbounded time. Best-effort and non-blocking: eviction
          // only happens when a THIRD (session, dir) shows up, and the
          // driver runs dirs sequentially, so nothing should be mid-read;
          // if something is, the unpersist degrades that reader to a
          // recompute-or-fail it would also have hit under a GC'd slot.
          evicted.foreach { case (_, _, v) =>
            frames(v).foreach { df =>
              try
                df.queryExecution.logical.collect {
                  case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
                }.foreach(_.unpersist(blocking = false))
              catch { case scala.util.control.NonFatal(_) => () }
            }
          }
          built
      }
    }

  /** Test hook: how many distinct builds are currently pinned. */
  private[graft] def pinned: Int = synchronized(slots.size)
}

/** The common single-frame instance (most memoized stages are one
  * checkpointed table); multi-frame stages (a k-means fit's centroids +
  * assignment) instantiate [[SessionDirMemoOf]] with their own frame
  * extractor so eviction unpersists every member. */
private[graft] final class SessionDirMemo
  extends SessionDirMemoOf[DataFrame](df => Seq(df))
