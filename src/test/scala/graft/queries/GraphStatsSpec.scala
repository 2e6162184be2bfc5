package graft.queries

import graft.SparkSuite

/** Pins the q113/q108 co-order graph's VOLUME numbers (round-8 advice):
  * when q113's bench time moves round-over-round, this spec answers
  * "did the data change?" without a bisect — a testdata regen that
  * shifts the 1995 graph's density fails here with the exact before/after
  * counts in the assertion message, while a plan or box drift leaves it
  * green. Current pins (sf0.001, driver drop of 2026-08): 233 edges,
  * 2 seed parts (pt % 100 == 0), frontier 2 → 11 → 27 → 57 over the three
  * bounded-BFS rounds. sf0.1 for the bench discussion: 25 715 edges /
  * 17 019 nodes / 181 seeds (ANALYSIS_r09_q113.md). */
class GraphStatsSpec extends SparkSuite {

  test("q113Stats pins the 1995 co-order graph volumes at sf0.001") {
    val got = TemporalQueries.q113Stats(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(got == Seq((0, 233L, 2L), (1, 233L, 11L),
      (2, 233L, 27L), (3, 233L, 57L)),
      s"co-order graph volume drifted (testdata regen?): $got")
  }
}
