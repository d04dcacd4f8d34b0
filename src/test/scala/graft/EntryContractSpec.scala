package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the SparkEntry registry. A typo'd
  * oracleSql key never fails loudly — the driver would just record a weaker
  * rows-only check — so the shape is pinned here instead.
  */
class EntryContractSpec extends AnyFunSuite {

  // the 7 hash-/FP-dependent queries that are rows-only BY DESIGN, each
  // covered by a named property test (SURVEY §2.C)
  private val rowsOnlyByDesign = Set(
    "q_agg_approx", "q_agg_approx_pct", "q_dedup_near", "q_dedup_simhash",
    "q_sim_ivf", "q_sim_ivf_trained", "q_fingerprint_rolling")

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL for unregistered queries: $orphans")
  }

  test("exactly the declared rows-only queries lack an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnlyByDesign,
      "every other query must carry a DuckDB oracle")
  }

  test("registry size matches the declared inventory") {
    assert(SparkEntry.queries.size === 77)
    assert(SparkEntry.oracleSql.size === 70)
  }
}
