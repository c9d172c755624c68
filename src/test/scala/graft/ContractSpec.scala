package graft

/** The driver contract itself: entry smoke, registry/oracle key discipline. */
class ContractSpec extends SparkSpec {

  test("entry() returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("registry names are unique across modules (no silent override)") {
    // SparkEntry merges module maps; a duplicate key would silently drop one
    // implementation. Sum of per-module contributions must equal merged size.
    val contributed = SparkEntry.moduleQueryCounts.sum
    val merged = SparkEntry.queries.size
    assert(contributed == merged,
      s"modules contribute $contributed keys but merged registry has $merged — duplicate name across modules")
    assert(merged >= 104, s"expected >= 104 queries, got $merged")
  }

  test("every query result is parquet-writable (no exotic output types)") {
    // spot-check the non-oracle queries (oracle ones are parquet-written by
    // Verify constantly); schema-only validation, no execution
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    noOracle.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$n has empty schema")
    }
  }
}
