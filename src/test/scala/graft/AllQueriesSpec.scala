package graft

/** Integration net: every registered query must execute at sf0.001
  * and produce sane, non-trivial output — catches breakage in queries
  * that have no dedicated spec, and enforces the driver contract
  * (every query has either an oracle or a documented reason not to).
  */
class AllQueriesSpec extends SparkSpec {

  // rows-only by design (sketches differ across engines); everything
  // else must carry an oracle
  private val noOracleAllowed =
    Set("approx_live_users", "approx_value_percentiles", "approx_top_tokens")

  test("every query runs and returns rows at sf0.001") {
    val empties = Seq("dedup_simhash")   // hamming<=6 pairs may be sparse at tiny SF
    SparkEntry.queries.foreach { case (name, fn) =>
      val rows = fn(spark, sfDir).count()
      if (!empties.contains(name))
        assert(rows > 0, s"query $name returned no rows")
    }
  }

  test("oracle coverage matches the declared contract") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    assert(oracles.subsetOf(queries),
      s"oracles without queries: ${oracles -- queries}")
    val missing = queries -- oracles -- noOracleAllowed
    assert(missing.isEmpty, s"queries missing an oracle: $missing")
  }

  test("entry() smoke: flagship query has rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
