package graft

/** Smoke: every registered query runs at sf0.001 and the oracle map
  * stays in sync with the query map. Value-level correctness is the
  * DuckDB gate (scripts/verify_local.py + driver t2).
  */
class QueriesSpec extends SparkSpec {

  test("oracle keys ⊆ query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry() smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
