package graft

/** Mirror of the driver's t1 smoke gate: the flagship entry query must
  * return rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, s"entry returned $n rows")
  }

  test("every declared query has an oracle, and vice versa") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }
}
