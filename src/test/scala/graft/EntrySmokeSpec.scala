package graft

/** Driver t1 mirror: `SparkEntry.entry` must return rows at sf0.001. */
class EntrySmokeSpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every queries entry has aligned oracle or is rows-only by design") {
    // every oracleSql key must have a queries entry (never the reverse)
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
