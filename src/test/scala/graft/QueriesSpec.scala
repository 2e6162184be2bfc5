package graft

/** Every declared query must run and keep its oracle contract shape; the
  * value-level check is the DuckDB oracle (driver t2 / tools/check_oracle.py).
  */
class QueriesSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0)
      // queries that must be non-empty on this data
      if (!Set("q14_anti_join").contains(name))
        assert(n > 0, s"$name unexpectedly empty")
    }
  }
}
