package graft

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * declared oracle key must have a matching query.
  */
class EntrySpec extends SparkSpec {

  test("entry(spark) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry; all queries run on sf0.001") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
    for ((name, fn) <- qs) {
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, s"$name failed")
    }
  }
}
