package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Native AsofJoin operator (custom LogicalPlan + Strategy + merge-scan
  * SparkPlan): semantics, edge cases, and agreement with the union+window
  * composition on the real events table. */
class AsofJoinSpec extends SparkSuite {

  import spark.implicits._

  private def asof(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame) =
    AsofJoinOps.asofLeft(l, r, "k", "rk", "t", "rt", "rid")

  private def leftDf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("k", "t", "lid")
  private def rightDf(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("rk", "rt", "rid")

  test("basic at-or-before matching per key") {
    val l = leftDf((1L, 10L, 100L), (1L, 20L, 101L), (2L, 10L, 200L))
    val r = rightDf((1L, 5L, 1L), (1L, 15L, 2L), (2L, 30L, 3L))
    val out = asof(l, r)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(1L)) // 5 <= 10, latest
    assert(out(101L).contains(2L)) // 15 <= 20
    assert(out(200L).isEmpty)      // only rt=30 > 10 for key 2
  }

  test("inclusive bound and tie-break to the largest rid") {
    val l = leftDf((1L, 10L, 100L))
    val r = rightDf((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
    val out = asof(l, r).select("rid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(Some(9L))) // rt == t matches; max rid wins
  }

  test("left rows with keys absent from the right get nulls") {
    val l = leftDf((5L, 10L, 100L))
    val r = rightDf((1L, 5L, 1L))
    val out = asof(l, r).select("rid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(None))
  }

  test("empty right side yields all-null matches, not an error") {
    val l = leftDf((1L, 10L, 100L), (2L, 20L, 200L))
    val r = rightDf().limit(0)
    val out = asof(l, r).select("rid").as[Option[Long]].collect()
    assert(out.toSeq == Seq(None, None))
  }

  test("many keys across shuffle partitions: matches stay key-local") {
    val l = (1L to 500L).map(k => (k, 100L, k)).toDF("k", "t", "lid")
    // right time == 50+k%3: all at-or-before 100 → every left row matches
    // its own key's single right row; a cross-key leak would mismatch ids
    val r = (1L to 500L).map(k => (k, 50L + k % 3, k * 10L))
      .toDF("rk", "rt", "rid")
    val out = asof(l, r).select("lid", "rid")
      .as[(Long, Option[Long])].collect()
    assert(out.length == 500)
    assert(out.forall { case (lid, rid) => rid.contains(lid * 10L) })
  }

  test("null keys and null times never match (SQL null semantics)") {
    val l = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
      (Some(1L), None, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(5L), 1L), (Some(1L), None, 2L),
      (None, Some(5L), 3L))
      .toDF("rk", "rt", "rid")
    val out = asof(l, r)
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    assert(out(100L).contains(1L)) // real match unaffected
    assert(out(101L).isEmpty)      // null left key
    assert(out(102L).isEmpty)      // null left time
    // and the null-keyed/timed right rows were never candidates
    assert(!out.values.flatten.exists(Set(2L, 3L)))
  }

  test("agrees with the union+window composition on real events (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val composed = graft.SparkEntry.queries("q25_asof_join")(spark, sf)
    val native = graft.SparkEntry.queries("q61_asof_native")(spark, sf)
    assert(native.count() > 0)
    assert(composed.exceptAll(native).isEmpty && native.exceptAll(composed).isEmpty)
  }

  test("plan shape: one shuffle and one sort per side, no window") {
    val sf = "/root/testdata/sf0.001"
    val plan = graft.SparkEntry.queries("q61_asof_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"))
    assert(!plan.contains("Window"))
  }
}
