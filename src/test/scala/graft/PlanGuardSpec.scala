package graft

import org.apache.spark.sql.execution.FormattedMode

/** Plan-shape regression guards: cheap FormattedMode string assertions at
  * sf0.001 so a future edit cannot silently reintroduce the round-2
  * pathological shapes (per-field JSON re-parse; unpruned scans). These test
  * the OPTIMIZED plan, not results — the correctness gate covers values.
  */
class PlanGuardSpec extends SparkSpec {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.explainString(FormattedMode)

  test("SparkEntry.entry satisfies the driver smoke contract (rows > 0)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_from_json parses each document exactly once") {
    val plan = formatted("q_from_json")
    val n = "from_json".r.findAllMatchIn(plan).size
    assert(n == 1,
      s"expected exactly 1 from_json evaluation in the plan, got $n:\n$plan")
  }

  test("q_scan_project prunes the lineitem scan to its 4 used columns") {
    val plan = formatted("q_scan_project")
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema line in plan:\n$plan"))
    val fields = read.substring(read.indexOf("struct<") + "struct<".length)
      .stripSuffix(">").split(",").map(_.split(":")(0).trim).toSet
    val expected =
      Set("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    assert(fields == expected,
      s"scan should read exactly $expected, got $fields in:\n$read")
  }

  // --- dedup family: the hardest-won plan shapes (VERDICT r5 #6) ---

  test("dedup candidate generation never reaches a SortMergeJoin") {
    // bucketPairs' map-side pair expansion measured ~10x faster than the
    // band-key self-join it replaced (Dedup.scala:24-25); every join these
    // plans DO contain (size prefilter, co-count verify) must stay
    // broadcast at test scale
    for (q <- Seq("q_dedup_near", "q_dedup_simhash", "q_dedup_ngram",
        "q_dedup_embed")) {
      val plan = formatted(q)
      assert(!plan.contains("SortMergeJoin"),
        s"$q regressed to a sort-merge join:\n$plan")
    }
  }

  test("q_dedup_incremental: index probe is a semi-join, no cartesian, " +
      "single split of each document") {
    val plan = formatted("q_dedup_incremental")
    assert(plan.contains("LeftSemi"),
      s"the stored-index probe must stay a left-semi join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no pair-expansion join shapes:\n$plan")
    // the O(tokens²) guard (r20): every shingle consumer must read the
    // materialized `_tk` projection. A raw split(text) re-inlined per
    // element access (the InferFiltersFromGenerate + filter-pushdown
    // regression) substitutes the split into EVERY tk reference of one
    // expression — 3+ `split(` occurrences on a single plan line. A
    // healthy plan has at most one per line (the `_tk` projection
    // itself, once per scan branch).
    val badLine = plan.linesIterator.find(l =>
      "split\\(".r.findAllMatchIn(l).size > 1)
    assert(badLine.isEmpty,
      s"a plan line re-splits the document per element — the _tk " +
        s"materialization boundary regressed:\n${badLine.getOrElse("")}")
  }

  test("q_join_full joins pre-aggregated sides on their own partitioning") {
    val plan = formatted("q_join_full")
    assert(plan.contains("FullOuter"), s"join must be full outer:\n$plan")
    // 2 pre-agg shuffles + the final sort exchange and NOTHING else: the
    // full-outer join must consume the aggregates' hash partitioning
    // directly (an extra exchange would mean the join re-shuffles the
    // fact-table-sized sides at scale)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 3,
      s"expected exactly 3 exchanges (2 agg + sort), got $exchanges:\n$plan")
  }

  test("q_dedup_norm never ships document text through a shuffle") {
    val plan = formatted("q_dedup_norm")
    val badExchange = "Exchange hashpartitioning\\([^)]*text#".r
    assert(badExchange.findFirstIn(plan).isEmpty,
      s"a shuffle carries raw text (must carry md5 keys only):\n$plan")
  }

  test("q_agg_pct_exact contains no exact value-map percentile aggregate") {
    val df = SparkEntry.queries("q_agg_pct_exact")(spark, sf0001)
    df.collect() // finalize AQE so runtime exchange reuse is visible
    val plan = df.queryExecution.explainString(FormattedMode)
    // the whole point: exactness WITHOUT Spark's per-group value-map
    // aggregate (only the bracketing sketch may appear)
    assert("(?<!approx_)percentile\\(".r.findFirstIn(plan).isEmpty,
      s"plan regressed to the exact percentile value-map aggregate:\n$plan")
    assert(plan.contains("approx_percentile"),
      s"bracket sketch missing from plan:\n$plan")
  }

  test("q_contamination keeps the broadcast eval-gram semi-join") {
    val plan = formatted("q_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join must be broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"eval-gram join regressed to sort-merge:\n$plan")
  }

  // --- q_pack_sequences: the two-level prefix sum (VERDICT r5 #2) ---

  test("q_pack_sequences packs via two-level prefix sum, no per-domain corpus window") {
    val df = SparkEntry.queries("q_pack_sequences")(spark, sf0001)
    df.collect() // finalize AQE so runtime stage reuse is visible
    val plan = df.queryExecution.explainString(FormattedMode)
    // balanced range splits on (lang, doc_id), not a hash on lang alone
    assert("rangepartitioning\\(lang#\\d+ ASC NULLS FIRST, doc_id#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"expected a (lang, doc_id) range split exchange:\n$plan")
    // the row-level cumsum window partitions by (blk, lang): its width is
    // the split size, never the domain size — the 100 TB skew guarantee
    assert("windowspecdefinition\\(blk#\\d+, lang#\\d+, doc_id#\\d+L? ASC"
      .r.findFirstIn(plan).isDefined,
      s"row-level cumsum must partition by (blk, lang):\n$plan")
    // both levels must read ONE range shuffle (ReusedExchange) — split ids
    // are only consistent between them because the stage is shared
    assert(plan.contains("ReusedExchange"),
      s"offsets branch must reuse the range exchange:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"no stage may collapse to a single partition:\n$plan")
  }

  test("q_quality_gate shuffles nothing before its contract sort") {
    // every rule signal is per-row array work in the scan stage; the only
    // Exchange the plan may contain is the final ORDER BY's range exchange
    val plan = formatted("q_quality_gate")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 1, s"expected only the sort exchange, got $exchanges:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"the single exchange must be the contract sort:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"no aggregation/join shuffle may appear:\n$plan")
  }

  // --- the round-6 rewrites: linear as-of, two-level rank (VERDICT r6 #5) ---

  test("q_join_asof is a single-pass carry-forward: one user_id exchange, no join") {
    // the linear formulation unions both sides into one per-user timeline
    // (TimeOps.asofJoin); a regression to the join+window form would
    // reintroduce the |purchases|x|clicks| per-user blowup
    val plan = formatted("q_join_asof")
    assert(!plan.contains("Join"),
      s"as-of must not contain any join operator:\n$plan")
    val hashEx = "hashpartitioning\\(user_id#\\d+".r.findAllMatchIn(plan).size
    assert(hashEx == 1,
      s"expected exactly one user_id hash exchange, got $hashEx:\n$plan")
  }

  test("generic asofJoinOn keeps the join-free single-exchange shape") {
    import org.apache.spark.sql.functions.col
    val left = spark.range(10).select(col("id"), (col("id") % 3).as("k"),
      (col("id") * 10).as("t"))
    val right = spark.range(5).select((col("id") % 3).as("k"),
      (col("id") * 7).as("rt"), col("id").as("v"))
    val plan = graft.operators.TimeOps
      .asofJoinOn(left, right, Seq("k"), "t", "rt")
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Join"),
      s"generic as-of must stay a union + carry-forward, no join:\n$plan")
    val hashEx = "hashpartitioning\\(k#\\d+".r.findAllMatchIn(plan).size
    assert(hashEx == 1,
      s"expected exactly one key exchange, got $hashEx:\n$plan")
  }

  test("q_window_rank ranks two-level: per-split local top-k before the priority window") {
    // o_orderpriority has ~5 values; a direct partitionBy(o_orderpriority)
    // window funnels the fact table through 5 reducers. Level 1 must key on
    // (o_orderpriority, pid) so ANY split assignment stays balanced; level 2
    // ranks only the <= 20*splits survivors
    val plan = formatted("q_window_rank")
    assert("windowspecdefinition\\(o_orderpriority#\\d+, pid#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"level-1 window must partition by (o_orderpriority, pid):\n$plan")
    assert("windowspecdefinition\\(o_orderpriority#\\d+, o_totalprice#\\d+"
      .r.findFirstIn(plan).isDefined,
      s"level-2 window must partition by o_orderpriority alone:\n$plan")
  }

  // --- probe-as-parameter overloads (VERDICT r5 #5) ---

  // --- generic *On forms over NON-fixture frames (VERDICT r7 #4) ---
  // the fixture queries delegate to the same code paths, but a user-shaped
  // frame with different lineage/stats could legally pick a different
  // strategy; pin the guarantees on a frame that shares nothing with the
  // fixture tables

  import org.apache.spark.sql.functions._

  private def userCorpus(n: Int) = {
    val toks = transform(sequence(lit(0), lit(29)),
      i => concat(lit("w"), pmod(col("id") * 31 + i * 13, lit(2003))))
    spark.range(n).select(col("id").as("doc_id"),
      pmod(col("id"), lit(3)).cast("string").as("lang"),
      array_join(toks, " ").as("text"))
      .withColumn("n_chars", length(col("text")))
  }

  test("minhashLshOn / ngramJaccardOn never reach a SortMergeJoin on a user frame") {
    val docs = userCorpus(500)
    for ((name, df) <- Seq(
        "minhashLshOn" -> graft.operators.Dedup
          .minhashLshOn(docs.select(col("doc_id"), col("text"))),
        "ngramJaccardOn" -> graft.operators.Dedup
          .ngramJaccardOn(docs.select(col("doc_id"), col("lang"),
            col("n_chars"), col("text"))))) {
      val plan = df.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("SortMergeJoin"),
        s"$name regressed to a sort-merge join on a user frame:\n$plan")
    }
  }

  test("qualityGateOn stays zero-shuffle before its contract sort on a user frame") {
    val plan = graft.operators.Text
      .qualityGateOn(userCorpus(500).select(col("doc_id"), col("n_chars"), col("text")))
      .queryExecution.explainString(FormattedMode)
    // ≤ 1: the only permissible exchange is the contract sort's — and on
    // this already-id-ordered frame Catalyst elides even that (0 exchanges)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges <= 1, s"expected at most the sort exchange, got $exchanges:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"no aggregation/join shuffle may appear:\n$plan")
  }

  test("contaminationOn keeps the broadcast eval-gram join on user frames") {
    val docs = userCorpus(500)
    val eval = userCorpus(40).select((col("doc_id") + 10000).as("doc_id"),
      col("text"))
    val plan = graft.operators.TrainPrep
      .contaminationOn(docs.select(col("doc_id"), col("text")), eval)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram join must be broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"eval-gram join regressed to sort-merge:\n$plan")
  }

  test("profileStats plans without an Expand in BOTH variants") {
    // the at-scale approx variant swaps every countDistinct for a
    // mergeable HLL sketch (no multi-distinct rewrite, so no Expand); the
    // exact default is the r14 per-(column, value) two-level aggregate —
    // a Generate feeding a map-side-partial hash aggregate — so neither
    // shape may multiply the scan through Expand, and the exact path must
    // keep its Generate (losing it would mean the reshape collapsed back
    // into a per-column plan)
    val approx = graft.operators.TrainPrep
      .profileStats(spark, sf0001, approx = true)
      .queryExecution.explainString(FormattedMode)
    assert(!approx.contains("Expand"),
      s"approx profile must not expand the scan:\n$approx")
    val exact = graft.operators.TrainPrep.profileStats(spark, sf0001)
      .queryExecution.explainString(FormattedMode)
    assert(!exact.contains("Expand"),
      s"exact profile regressed to the multi-distinct Expand:\n$exact")
    assert(exact.contains("Generate"),
      s"exact profile lost its single-scan explode reshape:\n$exact")
  }

  test("q_sample_group keeps only local top-k per group before its exchange") {
    val plan = formatted("q_sample_group")
    val n = "WindowGroupLimit".r.findAllMatchIn(plan).size
    assert(n >= 2,
      s"expected partial+final WindowGroupLimit (map-side top-k), got $n:\n$plan")
  }

  test("q_join_skew salts through a shuffled hash join, never a broadcast") {
    val plan = formatted("q_join_skew")
    assert(plan.contains("ShuffledHashJoin"),
      s"salted join must exercise the shuffle path:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"a broadcast would make the salt demonstration vacuous:\n$plan")
  }

  test("q_window_gap reuses the lag window's user exchange for its rollup") {
    val plan = formatted("q_window_gap")
    val hashEx = "hashpartitioning\\(user_id#\\d+".r.findAllMatchIn(plan).size
    assert(hashEx == 1,
      s"expected exactly one user_id hash exchange, got $hashEx:\n$plan")
  }

  test("q_embed_quantize is one scan, zero shuffles before its contract sort") {
    val plan = formatted("q_embed_quantize")
    // quantization is per-row: exactly one exchange (the range partition
    // for the final ORDER BY) and no join/aggregate may appear
    // count detail headers "(N) Exchange", not every mention (the tree
    // section repeats each operator name)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 1,
      s"expected only the contract sort's range exchange, got $exchanges:\n$plan")
    assert(!plan.contains("Join"), s"quantization must not join:\n$plan")
    assert(plan.contains("vec_quant_stats"),
      s"plan must run the codegen expression, not a HOF fallback:\n$plan")
  }

  test("q_quality_lm broadcasts the corpus total, never the token stream") {
    val plan = formatted("q_quality_lm")
    // the 1-row total must broadcast; the token-frequency join is left to
    // AQE (broadcast at this scale) — what must NEVER appear is a
    // cartesian over more than one row or a sort-merge join of raw tokens
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"corpus total must be a broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"token join regressed to sort-merge at test scale:\n$plan")
  }

  test("literal-probe similarity plans derive no probe from the corpus") {
    import graft.operators.Similarity
    val probe = Seq.tabulate(64)(i => (i % 7).toDouble / 7.0)
    val plans = Seq(
      "cosineTopK" -> Similarity.cosineTopK(spark, sf0001, 5, probe),
      "annLsh" -> Similarity.annLsh(spark, sf0001, 5, 4, probe),
      "ivf" -> Similarity.ivf(spark, sf0001, 5, 2, probe))
    for ((name, df) <- plans) {
      val plan = df.queryExecution.explainString(FormattedMode)
      assert("vec_id#\\d+L? = 0".r.findFirstIn(plan).isEmpty,
        s"$name(probeVec) still looks the probe up in the corpus:\n$plan")
    }
  }

  test("q_agg_hist / q_text_entropy shuffle counter rows only (3 exchanges each)") {
    // both are two-level aggregates whose data-sized stage is the scan +
    // map-side partial; everything after moves (group, bucket) / (doc,
    // vocab) counter rows. 3 exchanges = level-1 agg + level-2 rollup (or
    // share window) + the contract sort; a 4th would mean a data re-shuffle
    for (q <- Seq("q_agg_hist", "q_text_entropy")) {
      val plan = formatted(q)
      val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
      assert(exchanges == 3, s"$q: expected 3 exchanges, got $exchanges:\n$plan")
    }
    // the histogram scan must prune lineitem to its 2 used columns
    val read = formatted("q_agg_hist").linesIterator
      .find(_.contains("ReadSchema")).getOrElse(fail("no ReadSchema"))
    assert(read.contains("l_returnflag") && read.contains("l_extendedprice")
      && !read.contains("l_quantity"),
      s"histogram scan must read exactly its 2 columns: $read")
  }

  test("q_agg_hist_eq scans exactly its 2 columns and binning is a " +
      "broadcast, not a shuffle of the fact side") {
    val plan = formatted("q_agg_hist_eq")
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.nonEmpty && reads.forall(r =>
      r.contains("l_returnflag") && r.contains("l_extendedprice") &&
        !r.contains("l_quantity")),
      s"every lineitem scan must read exactly its 2 columns:\n$reads")
    assert(plan.contains("BroadcastHashJoin"),
      "the per-group edge row must broadcast to the classifier pass")
    assert(!plan.contains("SortMergeJoin"),
      "binning must never shuffle the fact side against the edges")
  }

  test("ivf assigns map-side: no ×codebook corpus expansion through an aggregate") {
    // the r16 shape crossJoined every corpus vector with the broadcast
    // codebook and collapsed the ×k expansion through a max_by(struct(
    // label, v, nrm, c_id)) partial aggregate — the bench's top GC line
    // (task GC 23.7 s) and, at 100 TB, one full-vector shuffle row per
    // corpus vector. The fixed shape keeps assignment a pure map-side
    // projection; since r22 it is ONE coarse_argmax codegen loop over
    // referenced centroid arrays (the former array_position-over-
    // literal-sims tree re-evaluated boxed literal centroids per
    // consumer per row — OPTIMIZATION_r22.md §2).
    for (q <- Seq("q_sim_ivf", "q_sim_ivf_trained")) {
      val plan = formatted(q)
      assert(!plan.contains("max_by"),
        s"$q: assignment regressed to the ×codebook max_by expansion")
      assert(plan.contains("coarse_argmax"),
        s"$q: single-loop coarse_argmax assignment shape missing")
    }
  }

  test("ivf_pq scores candidates map-side through literal lookup tables") {
    // the IVF-PQ pins: coarse assignment stays a map-side single-loop
    // coarse_argmax (no ×codebook expansion; r22 — see the ivf pin
    // above), ADC is the pq_adc codegen loop over a referenced lookup
    // table (never a per-row join against a codebook relation), and the
    // exact rerank joins via BROADCAST of the ≤ rerank candidate ids —
    // no shuffle anywhere on the corpus side
    for (q <- Seq("q_sim_ivf_pq", "q_sim_ivf_pq_res")) {
      val plan = formatted(q)
      assert(!plan.contains("max_by"),
        s"$q: coarse assignment regressed to the ×codebook max_by expansion")
      assert(plan.contains("coarse_argmax"),
        s"$q: single-loop coarse_argmax assignment shape missing")
      assert(plan.contains("pq_adc"),
        s"$q: ADC lookup-table scoring shape missing")
      assert(plan.contains("pq_encode"),
        s"$q: codegen pq_encode expression missing from the encode projection")
      assert(!plan.contains("CartesianProduct"),
        s"$q: IVF-PQ must never cartesian-join")
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"),
        s"$q: the exact rerank must broadcast the candidate ids")
    }
  }

  test("no oracled query emits a comparator-unsafe (array/map/struct) column") {
    // the driver's correctness comparator sorts + hashes SCALAR cells only:
    // an array<int> output column crashed its pandas sort_values in r16
    // (q_embed_codes, the round's one red row). Schema derivation is pure
    // plan analysis — no job runs — so the whole oracled registry is
    // checked here at build time; Verify re-asserts it at dump time.
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sf0001).schema.fields.collect {
        case f if !Verify.comparatorSafe(f.dataType) =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      s"oracled queries with non-scalar output columns: $offenders — " +
        "serialize to a canonical scalar (comma-joined string) in BOTH " +
        "the query and the oracle SQL")
  }

  test("q_multimodal_parse: pruned scan, map-side codegen parse, " +
      "counters-only shuffles") {
    val plan = formatted("q_multimodal_parse")
    // the scan reads exactly the fixture's four source columns (`source`
    // pruned); at 100 TB a real media table scans (lang, payload) only —
    // this pins that pruning reaches the parquet scan
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema line in plan:\n$plan"))
    val fields = read.substring(read.indexOf("struct<") + "struct<".length)
      .stripSuffix(">").split(",").map(_.split(":")(0).trim).toSet
    assert(fields == Set("doc_id", "text", "lang", "n_chars"),
      s"scan must prune to the fixture columns, got $fields")
    // the byte-level parse runs as the codegen expression, once, map-side
    assert(plan.contains("media_header_parse"),
      s"plan must run the codegen header parse:\n$plan")
    assert("media_header_parse".r.findAllMatchIn(
      plan.linesIterator.filter(_.contains("partial_")).mkString).isEmpty,
      "the parse must happen in the Project, not re-run per aggregate")
    // only k-group counter rows shuffle: partial-agg exchange + the
    // contract sort's range exchange — payload bytes never cross the wire
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 2,
      s"expected agg + contract-sort exchanges only, got $exchanges:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Expand"),
      s"parse pipeline must not join or expand:\n$plan")
  }

  test("q_multimodal_body: pruned scan, one-pass codegen body fold, " +
      "counters-only shuffles") {
    val plan = formatted("q_multimodal_body")
    val read = plan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema line in plan:\n$plan"))
    val fields = read.substring(read.indexOf("struct<") + "struct<".length)
      .stripSuffix(">").split(",").map(_.split(":")(0).trim).toSet
    assert(fields == Set("doc_id", "text", "lang", "n_chars"),
      s"scan must prune to the fixture columns, got $fields")
    // the sampled-amplitude fold runs as the codegen expression, once,
    // map-side — body bytes never leave the scan stage
    assert(plan.contains("media_body_stats"),
      s"plan must run the codegen body fold:\n$plan")
    assert("media_body_stats".r.findAllMatchIn(
      plan.linesIterator.filter(_.contains("partial_")).mkString).isEmpty,
      "the fold must happen in the Project, not re-run per aggregate")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllMatchIn(plan).size
    assert(exchanges == 2,
      s"expected agg + contract-sort exchanges only, got $exchanges:\n$plan")
    assert(!plan.contains("Join") && !plan.contains("Expand"),
      s"body pipeline must not join or expand:\n$plan")
  }
}
