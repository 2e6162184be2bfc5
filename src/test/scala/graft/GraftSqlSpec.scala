package graft

/** The per-(session, dir) view-registration memo must not go stale: an
  * out-of-band temp-view drop for the same dir has to trigger
  * re-registration, not a TABLE_OR_VIEW_NOT_FOUND at query time. */
class GraftSqlSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("run() re-registers views after an out-of-band drop") {
    val sentinel = Tables.names.head
    assert(GraftSql.run(spark, sf, s"SELECT count(*) AS n FROM $sentinel")
      .collect()(0).getLong(0) > 0)
    // simulate a foreign caller dropping a view for the same dir
    spark.catalog.dropTempView(sentinel)
    val n = GraftSql.run(spark, sf, s"SELECT count(*) AS n FROM $sentinel")
      .collect()(0).getLong(0)
    assert(n > 0, "memo skipped re-registration after the view was dropped")
  }
}
