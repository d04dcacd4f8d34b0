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
    "q_sim_ivf", "q_sim_ivf_trained", "q_sim_ivf_pq", "q_sim_ivf_pq_res",
    "q_sim_ivf_pq_stored",
    "q_fingerprint_rolling",
    "q_vocab_heavy")

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
    assert(SparkEntry.queries.size === 103)
    assert(SparkEntry.oracleSql.size === 92)
  }

  test("bench re-sampling policy: healthy host-side outliers only, bounded") {
    // fires: >2x running median, >=1s, zero spill, GC under 15% of wall
    assert(Bench.shouldResample(4.3, 0.9, 0L, 100L, 0))
    // in-JVM pressure must be KEPT (code-attributable, reproducible):
    assert(!Bench.shouldResample(4.3, 0.9, 512L, 100L, 0), "spill keeps")
    assert(!Bench.shouldResample(4.3, 0.9, 0L, 800L, 0), "heavy GC keeps")
    // under the ratio, under the absolute floor, or no reference median:
    assert(!Bench.shouldResample(1.7, 0.9, 0L, 10L, 0), "<=2x keeps")
    assert(!Bench.shouldResample(0.8, 0.3, 0L, 10L, 0), "sub-second keeps")
    assert(!Bench.shouldResample(4.3, 0.0, 0L, 10L, 0), "first sample keeps")
    // retry bound: after MaxResamples discards, accept whatever comes
    assert(!Bench.shouldResample(4.3, 0.9, 0L, 100L, Bench.MaxResamples))
    // GC threshold scales with wall: 600ms GC on a 10s sample is healthy
    assert(Bench.shouldResample(10.0, 2.0, 0L, 600L, 1))
  }
}
