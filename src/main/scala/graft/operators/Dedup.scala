package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Deduplication operators for large-scale training-data pipelines
  * (north-star set: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup). All formulations are shuffle-bounded:
  * candidate generation always goes through a blocking/bucketing key
  * (band hash, simhash band, (lang, length-bucket) block, label block) so
  * no O(n²) cross join ever materializes — the property that must hold at
  * 100 TB.
  */
object Dedup extends org.apache.spark.internal.Logging {

  private val SHINGLE = 3

  /** Candidate pairs of docs sharing a bucket, generated MAP-SIDE from
    * per-bucket doc lists instead of a bucket self-join: one groupBy
    * (collect the ≤`cap` members), then expand the pairs with nested array
    * transforms. The cap bounds every group's expansion at cap²; the
    * self-join formulation spent ~10× longer in the sort-merge machinery
    * for the same output (measured at sf0.1: 9.8 s → sub-second).
    */
  private[graft] def bucketPairs(
      buckets: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    buckets
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= cap)
      // chained explodes instead of a nested transform/filter HOF: both
      // Generates and the triangular filter stay in whole-stage codegen
      // (the HOF generator is CodegenFallback and ran the expansion stage
      // interpreted); emits cap² rows pre-filter but never materializes
      // them outside the stage
      .select(col("ds"), explode(col("ds")).as("a_id"))
      .select(col("a_id"), explode(col("ds")).as("b_id"))
      .filter(col("b_id") > col("a_id"))
      .distinct()

  /** [[bucketPairs]] with the pair's bucket MULTIPLICITY kept: same
    * grouping, cap filter and chained-explode expansion, but the final
    * dedup aggregates `m` = the number of shared buckets instead of
    * discarding it (same exchange — a map-side partial count replaces the
    * partial distinct). When the bucket key IS the item (n-gram blocking:
    * one bucket per (block, gram)), `m` is exactly the pair's intersection
    * count over the capped keys, which lets verification skip re-deriving
    * it from the item stream (r22, q_dedup_ngram).
    */
  private[graft] def bucketPairsCounted(
      buckets: DataFrame, keyCols: Seq[String], cap: Int): DataFrame =
    buckets
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) >= 2 && size(col("ds")) <= cap)
      .select(col("ds"), explode(col("ds")).as("a_id"))
      .select(col("a_id"), explode(col("ds")).as("b_id"))
      .filter(col("b_id") > col("a_id"))
      .groupBy("a_id", "b_id")
      .agg(count(lit(1)).as("m"))

  /** Size-bound prefilter on candidate pairs: Jaccard ≤ min(|a|,|b|) /
    * max(|a|,|b|) (intersection ≤ the smaller set, union ≥ the larger), so a
    * pair whose set SIZES already bound Jaccard below the threshold can
    * never pass verification. Purely implied-by: the surviving pairs'
    * jaccard values are unchanged, so oracles need no mirror. Returns the
    * sizes (za, zb) so verification can compute the union without another
    * join.
    */
  private def sizeBounded(
      cand: DataFrame, sizes: DataFrame, threshold: Double): DataFrame =
    cand
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("za")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("zb")), "b_id")
      .filter(least(col("za"), col("zb")) >=
        lit(threshold) * greatest(col("za"), col("zb")))

  /** Distinct word-level 3-gram shingles per document as a map-side ARRAY
    * column, over an arbitrary (doc_id, text, carry...) frame. Measured
    * (sf0.1, 5000 docs × ~52 grams): the per-row transform/array_distinct
    * computes full documents→shingles in ~0.24 s, 10× cheaper than
    * materializing an exploded gram stream through a token-level window
    * shuffle (a formulation tried in rounds 2-3 and removed in round 4 —
    * see [[ngramJaccard]]). Gram-LEVEL consumers (candidate generation
    * keyed by gram, co-count verification) derive their stream by
    * exploding these arrays: distinctness is already applied, per-doc
    * sizes are `size(shingles)`, and no token ever transits a shuffle
    * un-aggregated.
    */
  private[operators] def shingledOf(
      docs: DataFrame, carry: Seq[String] = Seq.empty): DataFrame =
    docs
      .select(Seq(col("doc_id")) ++ carry.map(col) :+
        split(col("text"), " ").as("tk"): _*)
      // the transform is guarded by when(), not only by the trailing
      // filter: optimizer rules (e.g. ConvertToLocalRelation) may
      // evaluate the projection before the filter reorders below it, and
      // an unguarded tk(i+2) on a sub-3-token doc is an ANSI
      // INVALID_ARRAY_INDEX crash, not a null
      .select(Seq(col("doc_id")) ++ carry.map(col) :+
        when(size(col("tk")) >= SHINGLE, array_distinct(transform(
          sequence(lit(0), size(col("tk")) - SHINGLE),
          i => concat_ws(" ", col("tk")(i), col("tk")(i + 1), col("tk")(i + 2))
        ))).as("shingles") :+ size(col("tk")).as("_ntk"): _*)
      .filter(col("_ntk") >= SHINGLE)
      .drop("_ntk")

  /** Shingles with the (lang, 100-char length-block) blocking columns the
    * n-gram family keys candidate generation on. The block width is part
    * of the DECLARED oracle semantics — this is its single definition.
    */
  private[operators] def blockedShingles(docs: DataFrame): DataFrame =
    shingledOf(
      docs.select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 100).cast("int").as("blk"), col("text")),
      carry = Seq("lang", "blk"))

  /** The fixture instantiation: the documents table with blocking. */
  private[operators] def shingled(s: SparkSession, dir: String): DataFrame =
    blockedShingles(Tables.documents(s, dir))

  /** Replace each shingle STRING with its 64-bit xxhash64 fingerprint,
    * map-side, before the arrays are persisted or any gram leaves its
    * partition. Set distinctness, sizes, intersections, and document
    * frequencies are all preserved under an injective-in-practice hash
    * (collision odds across d distinct grams ≈ d²/2⁶⁵ — ~10⁻⁷ at the
    * ~10⁶-gram fixture, and any collision would surface loudly as an
    * oracle hash mismatch, never silently). What changes is the FOOTPRINT:
    * a ~30-byte 3-word shingle string (plus JVM object overhead in a
    * deserialized cache) becomes 8 bytes, so the persisted shingle base,
    * the exploded gram stream, and every candidate-generation groupBy /
    * co-count join shuffles longs instead of text — the r13→r14 driver
    * bench breach concentrated exactly in this family's cache+shuffle
    * pressure, and at 100 TB "fingerprints in the shuffle, never text" is
    * the only shape that holds regardless of host memory headroom.
    */
  private[operators] def gramFingerprints(base: DataFrame): DataFrame =
    base.withColumn("shingles", transform(col("shingles"), g => xxhash64(g)))

  /** Exact dedup: first event per (user_id, event_type) — the streaming
    * dropDuplicates semantics, batch-checkable as row_number()=1 with a
    * deterministic (ts, event_id) tiebreak.
    */
  def exact(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_ms").asc, col("event_id").asc)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Norm.ms(col("ts")).as("ts_ms"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts_ms"))
      .orderBy("user_id", "event_type")
  }

  /** Normalization-aware exact dedup: case-fold + whitespace-collapse +
    * trim BEFORE keying, so trivially-reformatted copies (the most common
    * scrape duplicates: casing, doubled spaces, stray tabs) collapse onto
    * one key that byte-exact dedup misses. The fixture corpus is already
    * byte-distinct, so deterministic variants (every 5th doc re-emitted
    * uppercased with noisy whitespace, id + 1e6) are injected first — the
    * oracle applies the identical injection, so the groups the normalizer
    * must find are known. Output: one row per normalized key with > 1
    * members — n_docs, distinct raw forms, and the kept (minimum) doc id.
    *
    * Scale shape: pure map-side normalization + one hash aggregate on the
    * normalized key (md5 — constant width regardless of doc length, so the
    * shuffle carries 16 bytes + counters per doc, never the text).
    */
  def normalizeDedup(s: SparkSession, dir: String): DataFrame = {
    // FIXTURE-ONLY variant injection: the synthetic corpus is
    // byte-distinct, so the registry query manufactures reformatted
    // twins (every 5th doc uppercased with padding, id offset past the
    // fixture's id range) to give the normalizer real work — the oracle
    // injects the identical rows. This is the QUERY's declared fixture
    // semantics, NOT operator surface: [[normalizeDedupOn]] deduplicates
    // exactly the frame it is given.
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val variants = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit(" \t")).as("text"))
    normalizeDedupOn(docs.union(variants))
  }

  /** [[normalizeDedup]] over an arbitrary (doc_id: long, text: string)
    * frame (ASCII normalization semantics: `\s` and case folding match
    * Java and RE2 for ASCII; extend with ICU transforms off-fixture).
    * Deduplicates the given frame AS IS — no synthetic rows (the fixture
    * query injects its own variants before calling this).
    */
  def normalizeDedupOn(docs: DataFrame): DataFrame = {
    docs
      // raw forms are counted by their md5, not the text itself, so the
      // distinct aggregate ships two 16-byte hashes + a doc id per row —
      // never the document
      .select(col("doc_id"), md5(col("text")).as("raw_key"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
          .as("norm_key"))
      .groupBy("norm_key")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("raw_key")).as("n_raw_forms"),
        min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .orderBy("keep_id")
  }

  /** MinHash + LSH near-dup: 32 xxhash64 min-signatures over word shingles,
    * banded 4×4; docs sharing any band hash become candidates
    * (shuffle join on the band key — the LSH bucket-join); candidates are
    * verified with exact shingle Jaccard ≥ threshold.
    * Hash-dependent candidate set → no SQL oracle (driver rows-only check);
    * the ScalaTest spec asserts containment in the exact-Jaccard pair set.
    */
  def minhashLsh(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame =
    minhashLshOn(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      threshold)

  /** [[minhashLsh]] over an arbitrary (doc_id: long, text: string) frame —
    * the form a user points at their own corpus.
    */
  def minhashLshOn(docs: DataFrame, threshold: Double = 0.4): DataFrame = {
    // 8 bands of 4: candidate probability 1-(1-j⁴)⁸ ≈ 0.9998 at j=0.9,
    // 0.985 at j=0.8 — high recall in the near-dup region while a random
    // pair (j≈0.05) stays below 10⁻⁴
    val numHashes = 32
    val bandSize = 4
    // one materialization of the shingle arrays — as 64-bit xxhash64
    // FINGERPRINTS, hashed once per shingle — feeds signature computation,
    // the size prefilter, and both verification joins: the 32 seeded hashes
    // and the verify array_intersect then work on longs instead of
    // re-hashing/comparing ~25-char strings (set semantics identical up to
    // a 2⁻⁶⁴ fingerprint collision — this is a hash-defined operator). The
    // array form is deliberate: an exploded-gram reformulation (window
    // leads + 32-way min aggregation) was tried and REVERTED — A/B at
    // sf0.1 measured 3.3 s → 7.1 s, the token-level window shuffle
    // costing far more than the per-row lambdas it removed.
    val base = shingledOf(docs)
      .select(col("doc_id"),
        transform(col("shingles"), sh => xxhash64(sh)).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // 32 independent seeded hashes per shingle fingerprint: a two-hash
    // h1+i·h2 shortcut was tried and REVERTED — the derived family
    // correlates the per-band minima enough to miss j≥0.9 pairs the recall
    // property requires. Seeding a fresh xxhash64 over the fingerprint
    // keeps the 32 functions independent (full avalanche per seed).
    // All 32 minima come from ONE codegen'd pass over the fingerprint
    // array ([[graft.functions.MinHashes]], bit-identical to the
    // 32×array_min(transform(...)) HOF formulation it replaced — which ran
    // 32 INTERPRETED passes per row, the query's dominant compute).
    val sigCols: Column = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MinHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(col("hs")), numHashes))
    val sigs = base.select(col("doc_id"), sigCols.as("sig"))
    val bands = sigs.select(col("doc_id"),
        posexplode(array((0 until numHashes / bandSize).map { b =>
          xxhash64((b * bandSize until (b + 1) * bandSize)
            .map(j => col("sig")(j)): _*)
        }: _*)).as(Seq("band_idx", "band_hash")))
    // bucket-size guard folded into the map-side pair expansion: a band
    // bucket shared by > 100 docs (near-empty or boilerplate-dominated
    // texts collapse to identical signatures) would contribute O(|bucket|²)
    // pairs; such buckets are skipped — their members overwhelmingly share
    // OTHER, smaller buckets when genuinely similar
    val cand = bucketPairs(bands, Seq("band_idx", "band_hash"), cap = 100)
    val sh = base.select(col("doc_id"), col("hs").as("shingles"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("sz"))
    sizeBounded(cand, sizes, threshold)
      .join(sh.select(col("doc_id").as("a_id"), col("shingles").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("shingles").as("sb")), "b_id")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard", Norm.r4(col("inter") /
        (col("za") + col("zb") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** Per-doc 64-bit simhash values — the fixture instantiation of
    * [[simhashDocsOn]] (the one-pass `simhash64` expression path;
    * OperatorPropertiesSpec "simhash64 expression, packed aggregate, and
    * naive 64-buffer agree bit-for-bit" pins it against both retained
    * reference formulations).
    */
  private[graft] def simhashDocs(s: SparkSession, dir: String): DataFrame =
    simhashDocsOn(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  /** Per-doc 64-bit simhash via the one-pass [[graft.functions.SimHash64]]
    * codegen expression — pure map work, no token materialization, no
    * shuffle (r14; the aggregate formulation below is retained as the
    * bit-identity reference the property spec compares against — it was
    * the dedup family's highest task-GC line in the r14 bench telemetry).
    */
  private[graft] def simhashDocsOn(docs: DataFrame): DataFrame = {
    val sh = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text"))))
    docs
      .select(col("doc_id"), sh.as("simhash"))
      // a null text has no tokens in the exploded formulation (the doc
      // simply never appears); the expression null-propagates instead —
      // drop those rows to keep the two shapes identical
      .filter(col("simhash").isNotNull)
  }

  private[graft] def simhashDocsAggregated(docs: DataFrame): DataFrame = {
    // hash DISTINCT tokens once, weighted by occurrence count: documents
    // repeat tokens heavily (stopwords), so pre-aggregating
    // (doc_id, token_hash) → count shrinks the rows that reach the
    // expensive 64-term packed-vote projection by the repetition factor.
    // A single repartition(doc_id) up front makes BOTH groupBys
    // partition-local (HashPartitioning(doc_id) satisfies the clustered
    // distribution of (doc_id, h) and of (doc_id)) — one shuffle of the
    // raw document rows total, where the round-3 formulation shuffled a
    // 33-long partial-agg row per doc per input partition AND ran the
    // packed projection once per token occurrence.
    val tok = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id", "h")
      .agg(count(lit(1)).as("c"))
    // accumulate the 64 per-bit vote counters PACKED 2-per-long in 32-bit
    // fields: per distinct token, field i holds ((h>>i)&1)·c, and summing
    // the packed longs sums every field independently (ones-counts are
    // non-negative — no cross-field borrow — and bounded by the doc's
    // TOTAL token count including repeats, which can never reach 2³², so
    // the fields stay unconditionally overflow-safe under weighting).
    // The ±1 vote is recovered by the bias identity
    // votes_i = 2*ones_i - n_tokens, so bit i is set iff 2*ones_i > n.
    // Packing replaces 64 sum(when(...)) aggregate buffers with 32+1 — the
    // combine loop and its generated code shrink ~2×.
    val fieldsPerLong = 2
    val fieldBits = 32
    val packedOnes = (0 until 64 / fieldsPerLong).map { k =>
      sum((0 until fieldsPerLong).map { j =>
        shiftleft(shiftright(col("h"), k * fieldsPerLong + j)
          .bitwiseAND(1L) * col("c"), j * fieldBits)
      }.reduce(_ + _)).as(s"p$k")
    }
    val votes = tok
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n"), packedOnes: _*)
    // unpack ones-counts and assemble the 64-bit simhash (post-agg
    // projection over one row per doc — negligible)
    val packed: Column = (0 until 64).map { i =>
      val ones = shiftright(col(s"p${i / fieldsPerLong}"),
        (i % fieldsPerLong) * fieldBits).bitwiseAND(0xFFFFFFFFL)
      when(ones * 2 > col("n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    votes.select(col("doc_id"), packed.as("simhash"))
  }

  /** SimHash near-dup: 64-bit token-level simhash; candidate pairs via
    * 4×16-bit band buckets, verified with Hamming distance ≤ k (bit_count
    * of xor). Hash-dependent → rows-only driver check.
    */
  def simhash(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhashOn(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      maxHamming)

  /** [[simhash]] over an arbitrary (doc_id: long, text: string) frame. */
  def simhashOn(corpus: DataFrame, maxHamming: Int = 3): DataFrame = {
    val docs = simhashDocsOn(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = docs.select(col("doc_id"),
      posexplode(array((0 until 4).map { b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(0xFFFFL)
      }: _*)).as(Seq("band_idx", "band_key")))
    // map-side pair expansion with a 100-doc bucket guard (empty/boilerplate
    // texts share signatures; see bucketPairs)
    bucketPairs(bands, Seq("band_idx", "band_key"), cap = 100)
      .join(docs.select(col("doc_id").as("a_id"), col("simhash").as("ha")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("simhash").as("hb")), "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("a_id", "b_id")
  }

  /** Exact n-gram (word 3-gram) Jaccard near-dup within (lang,
    * length-bucket) blocks: shingle-level shuffle join inside blocks only.
    * Fully deterministic and SQL-expressible → real DuckDB oracle.
    */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.2,
      hotCap: Int = 25): DataFrame =
    ngramJaccardOn(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text")),
      threshold, hotCap)

  /** [[ngramJaccard]] over an arbitrary (doc_id, lang, n_chars, text)
    * frame — lang and character count feed the (lang, length-block)
    * blocking; pass constants if the corpus has no language column.
    */
  def ngramJaccardOn(docs: DataFrame, threshold: Double = 0.2,
      hotCap: Int = 25): DataFrame = {
    // one persisted materialization of the per-doc shingle ARRAYS
    // (MEMORY_AND_DISK so a 100 TB corpus spills instead of OOMing; at that
    // scale a real pipeline writes the shingle table to storage — same
    // idea). The gram-level stream that candidate generation and the
    // co-count verification join on is a cheap per-partition explode of
    // these arrays: distinctness is pre-applied by array_distinct and
    // per-doc sizes are size(shingles), so the rounds-2/3 formulation —
    // a token-level Window.partitionBy(doc_id) sort shuffle feeding two
    // window leads plus a 4-column distinct groupBy — disappears entirely
    // (it was 29 s of the 93 s round-3 bench; the arrays compute the
    // identical stream map-side). The persisted arrays hold gram
    // FINGERPRINTS ([[gramFingerprints]]), not strings — the cache and
    // every downstream shuffle carry 8-byte longs.
    val base = gramFingerprints(blockedShingles(docs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    ngramPairs(base, threshold, hotCap)
      .orderBy("a_id", "b_id")
  }

  /** Cross-document duplicated-SUBSTRING fraction per doc: what share of a
    * document's distinct word-3-grams also occur in at least one OTHER
    * document, plus a keep/drop gate at `dropAt` — the per-doc signal of
    * exact-substring dedup (the RefinedWeb/MassiveText pipeline stage that
    * drops documents dominated by spans repeated verbatim across the
    * corpus; Penedo et al. 2023 §3.3, Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" §4.1 — public papers).
    *
    * Scale shape: per-doc distinct grams derive map-side from the shared
    * shingle arrays ([[shingledOf]]), document frequency is one
    * gram-keyed aggregate with map-side partials, and the only join is
    * gram-stream ⋈ gram-frequency — counters all the way, never a pair
    * expansion, so boilerplate grams shared by millions of docs cost one
    * skewed-join key (AQE-splittable), not O(n²) candidates. Contrast the
    * suffix-array formulation of the papers: a distributed engine gets the
    * same per-doc signal from two shuffles.
    */
  def substringDup(s: SparkSession, dir: String,
      dropAt: Double = 0.8): DataFrame =
    substringDupOn(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), dropAt)

  /** [[substringDup]] over an arbitrary (doc_id, text) frame. */
  def substringDupOn(docs: DataFrame, dropAt: Double = 0.8): DataFrame = {
    // one persisted materialization of the per-doc distinct gram arrays —
    // the same base discipline as [[ngramJaccardOn]] (two consumers:
    // the document-frequency aggregate and the join's probe side), and
    // ALSO the optimizer barrier that keeps InferFiltersFromGenerate's
    // non-empty-array filter from collapsing the whole shingle pipeline
    // into a per-row scan predicate: un-persisted, the inferred
    // size(array_distinct(transform(...))) > 0 condition inlines
    // split(text) PER GRAM ACCESS in both branches — O(tokens²) per doc
    // in a filter, measured 8.6 s vs 1.9 s for the same query at sf0.1.
    // Grams are 64-bit fingerprints ([[gramFingerprints]]): the df
    // aggregate keys and the join ship longs, never gram text.
    val base = gramFingerprints(shingledOf(docs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val grams = base.select(col("doc_id"), explode(col("shingles")).as("gram"))
    // per-doc arrays are distinct, so count(1) here = docs containing gram
    val docFreq = grams.groupBy("gram").agg(count(lit(1)).as("nd"))
    val perDoc = grams.join(docFreq, "gram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("dup_grams"))
      .withColumn("dup_frac", Norm.r4(col("dup_grams") / col("n_grams")))
    // EVERY doc gets a verdict: a sub-3-token doc has no grams, so
    // nothing of it is duplicated — (0, 0, 0.0, keep) — rather than
    // silently missing from the output and leaking past a
    // `filter(!keep)` drop join
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("dup_frac"), lit(0.0)).as("dup_frac"))
      // gate on the ROUNDED fraction (dup_frac is the declared output; a
      // boundary doc must not flip between the column and its own flag)
      .withColumn("keep", col("dup_frac") < dropAt)
      .orderBy("doc_id")
  }

  /** SPAN-level duplicated-text removal stats (registry `q_span_scrub`):
    * where [[substringDup]] GATES whole documents by their duplicated-gram
    * fraction, real pipelines remove the duplicated spans themselves and
    * keep the rest of the document (Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" §4.1 ExactSubstr;
    * RefinedWeb, Penedo et al. 2023 — public papers). Declared semantics:
    *   - positional word-3-grams per document (every occurrence, NOT
    *     deduplicated — position matters for spans);
    *   - a gram occurrence is DUPLICATED when its gram appears in
    *     ≥ `minDf` distinct documents;
    *   - a token is covered when any duplicated gram occurrence spans it;
    *   - maximal runs of covered tokens are the spans to scrub. Per doc:
    *     `n_tokens`, `tokens_removed` (covered tokens), `spans_removed`
    *     (maximal runs), `chars_removed` (covered token chars + each
    *     run's internal spaces — what excising the runs would delete),
    *     and `span_frac` = tokens_removed / n_tokens.
    *
    * Scale shape — counters only, the suffix-array-free formulation:
    * the persisted base holds per-doc POSITIONAL gram fingerprints and
    * token lengths (longs/ints, never text — the [[gramFingerprints]]
    * discipline); document frequency is one gram-keyed aggregate over
    * map-side-distinct arrays; duplicated occurrences come from a
    * LEFT SEMI join against the ≥ minDf gram keys (a filter — boilerplate
    * grams are one skewed join key, AQE-splittable, never a pair
    * expansion); coverage is a bounded ×3 position explode + distinct;
    * runs need no islands-distinct (no Expand) — a lag-window marks run
    * STARTS and one per-doc aggregate folds counts, starts, and chars.
    * Every shuffle carries (id, int) counters. Deterministic → full
    * DuckDB oracle, hash-checked at all three SFs.
    */
  def spanScrub(s: SparkSession, dir: String, minDf: Int = 2): DataFrame =
    spanScrubOn(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      minDf)

  /** [[spanScrub]] over an arbitrary (doc_id, text) frame. */
  def spanScrubOn(docs: DataFrame, minDf: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    // one persisted, text-free base per doc: n_tokens, positional gram
    // fingerprints (null when < SHINGLE tokens — explode skips it), and
    // per-token char lengths. Three consumers (df aggregate, occurrence
    // stream, token-length stream) and the same optimizer barrier the
    // substringDup base documents (un-persisted, the inferred non-empty
    // filter inlines split(text) per gram access).
    val base = docs
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"),
        size(col("tk")).as("n_tokens"),
        when(size(col("tk")) >= SHINGLE, transform(
          sequence(lit(0), size(col("tk")) - SHINGLE),
          i => xxhash64(concat_ws(" ",
            col("tk")(i), col("tk")(i + 1), col("tk")(i + 2)))))
          .as("gfps"),
        transform(col("tk"), t => length(t)).as("tlens"))
      .persist(MEMORY_AND_DISK)
    // document frequency over per-doc-DISTINCT grams (map-side distinct,
    // so count(1) = containing docs) — only the ≥ minDf keys survive
    val dupKeys = base
      .select(explode(array_distinct(col("gfps"))).as("gfp"))
      .groupBy("gfp").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDf)
      .select("gfp")
    // duplicated gram OCCURRENCES → covered token positions (×3 bounded
    // explode, then distinct: overlapping grams cover shared tokens once)
    val covered = base
      .select(col("doc_id"), posexplode(col("gfps")).as(Seq("pos", "gfp")))
      .join(dupKeys, Seq("gfp"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(2))).as("t"))
      .distinct()
    // attach token lengths, mark run starts with ONE lag window (no
    // countDistinct → no Expand), fold per doc
    val tlen = base.select(col("doc_id"),
      posexplode(col("tlens")).as(Seq("t", "tok_len")))
    val w = Window.partitionBy("doc_id").orderBy("t")
    val perDoc = covered
      .join(tlen, Seq("doc_id", "t"))
      .withColumn("is_start",
        when(lag(col("t"), 1).over(w) === col("t") - 1, 0L).otherwise(1L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("tokens_removed"),
        sum(col("is_start")).as("spans_removed"),
        (sum(col("tok_len")) + count(lit(1)) - sum(col("is_start")))
          .as("chars_removed"))
    // every doc gets a verdict (sub-3-token docs have no grams → zeros),
    // the substringDup completeness convention
    base.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("tokens_removed"), lit(0L)).as("tokens_removed"),
        coalesce(col("spans_removed"), lit(0L)).as("spans_removed"),
        coalesce(col("chars_removed"), lit(0L)).as("chars_removed"))
      .withColumn("span_frac",
        Norm.r4(col("tokens_removed") / col("n_tokens")))
      .orderBy("doc_id")
  }

  /** Core of [[ngramJaccard]] over an already-persisted shingle base —
    * factored out so [[nearDupClusters]] can own the base's lifecycle and
    * unpersist the (large) shingle arrays the moment the (tiny) pair graph
    * is materialized. Returns the verified pairs UNSORTED: the cluster path
    * persists and counts this result, and a trailing global sort would ride
    * into the cached plan (range-exchange sample job + the sort itself) for
    * an output whose order the label propagation never reads —
    * [[ngramJaccard]] adds its contract ORDER BY on top.
    */
  private def ngramPairs(
      base: DataFrame, threshold: Double, hotCap: Int): DataFrame = {
    val grams = base.select(col("doc_id"), col("lang"), col("blk"),
      explode(col("shingles")).as("gram"))
    // hot-shingle guard: a shingle present in > hotCap docs of one block
    // (boilerplate) would alone produce O(hotCap²) candidate pairs; the
    // bucketPairsCounted cap drops it from CANDIDATE GENERATION (not from
    // verification). Part of the declared semantics — the oracle applies
    // the same df ≤ hotCap filter.
    //
    // r22 verification rewrite (guide §2.3 aggregate-before-shuffle /
    // §3.3 don't explode before a join): a candidate pair's bucket
    // multiplicity `m` IS its intersection count over the capped grams —
    // both docs of a pair share one (lang, blk), and every shared gram
    // with block-df in [2, hotCap] is exactly one generating bucket — so
    // the former coCount verification (pair × a-grams re-explode joined
    // against the gram stream on (b_id, gram): a |pairs|·|grams-per-doc|
    // row fan-out plus TWO corpus-scale gram-stream joins) collapses to
    //   inter = m + |shared HOT grams|,
    // where the hot remainder (block-df > hotCap — excluded from
    // candidates but counted by verification, the declared full-set
    // semantics) comes from a map-side array_intersect of the two docs'
    // per-doc hot-gram arrays that ride the existing size-prefilter
    // joins. The hot dictionary (one array of df>hotCap gram fingerprints
    // per block) is boilerplate-vocabulary-sized — it grows with the
    // block's repeated-phrase vocabulary, never with corpus rows (every
    // hot gram needs > hotCap occurrences) — and is broadcast exactly
    // like a stopword list; per-doc hot arrays carry only the grams the
    // doc shares with that dictionary. Integer arithmetic throughout →
    // bit-identical jaccard (oracle hash-gated ×3 SFs).
    val candM = bucketPairsCounted(grams, Seq("lang", "blk", "gram"),
      cap = hotCap)
    val hotPerBlock = grams
      .groupBy("lang", "blk", "gram").agg(count(lit(1)).as("df"))
      .filter(col("df") > hotCap)
      .groupBy("lang", "blk").agg(collect_list(col("gram")).as("hot_grams"))
    val sizesHot = base
      .join(broadcast(hotPerBlock), Seq("lang", "blk"), "left")
      .select(col("doc_id"), size(col("shingles")).as("sz"),
        coalesce(array_intersect(col("shingles"), col("hot_grams")),
          typedLit(Seq.empty[Long])).as("hot"))
    candM
      .join(sizesHot.select(col("doc_id").as("a_id"), col("sz").as("za"),
        col("hot").as("hot_a")), "a_id")
      .join(sizesHot.select(col("doc_id").as("b_id"), col("sz").as("zb"),
        col("hot").as("hot_b")), "b_id")
      // size-bound prefilter (Jaccard ≤ min/max of the set sizes), same
      // rule as [[sizeBounded]] — purely implied-by, surviving pairs'
      // jaccard values are unchanged
      .filter(least(col("za"), col("zb")) >=
        lit(threshold) * greatest(col("za"), col("zb")))
      .withColumn("inter",
        (col("m") + size(array_intersect(col("hot_a"), col("hot_b"))))
          .cast("int"))
      .withColumn("jaccard",
        Norm.r4(col("inter") / (col("za") + col("zb") - col("inter"))))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
  }

  /** Near-duplicate CLUSTERS from the deterministic n-gram pair graph —
    * the step that makes dedup actionable: pairs → connected components →
    * one canonical representative (min doc_id) per component, so a
    * pipeline can `filter(!is_rep)` to DROP duplicates rather than merely
    * list them. Pregel-style min-label propagation: each iteration is one
    * keyed join + min-aggregation over the (tiny, cap-bounded) pair graph,
    * iterated to a driver-checked fixpoint — the standard scalable CC
    * formulation (no whole-graph driver state; the only driver value is
    * the converged? count). Near-dup components are dense (near-cliques),
    * so the label frontier collapses in 2–3 iterations regardless of
    * corpus size; a convergence `require` guards the pathological case
    * rather than silently emitting unconverged labels. Deterministic
    * (derived from the oracled ngram pairs) → full SQL oracle via a
    * recursive CTE.
    */
  def nearDupClusters(s: SparkSession, dir: String, maxIters: Int = 20): DataFrame =
    nearDupClustersOn(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text")),
      maxIters)

  /** [[nearDupClusters]] over an arbitrary (doc_id, lang, n_chars, text)
    * frame — n-gram pair generation + [[clusterPairs]] in one call.
    */
  def nearDupClustersOn(docs: DataFrame, maxIters: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the cluster path owns the shingle base's lifecycle: the arrays are
    // the query's largest cached object and are only needed until the
    // (tiny) pair graph is materialized inside clusterPairs' first job.
    // Level stays MEMORY_AND_DISK: the round-10 A/B of the r8/r9
    // cold-first-sample residual switched every shingle cache to
    // MEMORY_AND_DISK_SER and LOST on both cold and warm samples
    // (ABLOG_r10.md) — the kryo/serialization cost of the string arrays
    // exceeds what the smaller blocks save. r14 removes the strings
    // instead of re-encoding them: the cached arrays are 64-bit gram
    // fingerprints ([[gramFingerprints]]), the cheaper answer to the same
    // footprint problem that A/B was probing.
    val base = gramFingerprints(blockedShingles(docs)).persist(MEMORY_AND_DISK)
    clusterPairs(
      ngramPairs(base, threshold = 0.2, hotCap = 25)
        .select(col("a_id"), col("b_id")),
      maxIters,
      afterFirstJob = () => base.unpersist(blocking = true))
  }

  /** Connected components over an ARBITRARY undirected pair graph —
    * [[nearDupClusters]]'s label propagation factored out as reusable
    * library surface, so a pipeline can cluster pairs produced by ANY
    * candidate generator ([[minhashLsh]], [[simhash]], [[embedCosine]], or
    * its own) the same way. Input: two LONG columns `a_id`, `b_id` (one row
    * per undirected edge; duplicates and orientation don't matter). Output:
    * (doc_id, cluster_rep = component-min id, is_rep, cluster_size) for
    * every id that appears in some pair — isolated nodes never enter the
    * graph, callers left-join them back as their own singleton reps.
    *
    * Scalability contract is the one the oracled query proved: per-round
    * state is O(|pairs|) with one keyed shuffle per round, no whole-graph
    * driver state, driver sees only the convergence count. `afterFirstJob`
    * fires once the pair plan is materialized into its cache — the hook
    * [[nearDupClusters]] uses to drop its (much larger) shingle base at
    * the earliest safe moment.
    *
    * `localEdgeCap` (0 disables): edge lists at or under the cap are
    * collected in ONE job and clustered with in-memory union-find —
    * identical output contract, no per-round scheduled jobs (the
    * distributed loop's wall-clock driver at any data size, since its
    * per-round state is tiny and its cost is stages). Dedup pair graphs
    * are cap-bounded by construction, so in practice this is the executed
    * path; the distributed loop remains the over-cap fallback.
    */
  def clusterPairs(pairList: DataFrame, maxIters: Int = 20,
      afterFirstJob: () => Unit = () => (),
      localEdgeCap: Int = 1000000): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import StorageLevel.MEMORY_AND_DISK
    // the pair list must be cached BEFORE the loop: every round's
    // `edges` re-derives from `pairs`, and without a populated cache each
    // read would re-execute the whole upstream candidate-generation/
    // verification query. The cache is filled by the first confirming
    // round's materialization below — one job computes pairs AND the
    // folded first round, instead of a separate pairs.count() job.
    // Respect a CALLER-owned cache: persisting is a no-op on an
    // already-cached frame, but unpersisting it at the end would evict
    // state the caller still reads — only manage the lifecycle of a cache
    // this function created.
    val callerCached = pairList.storageLevel != StorageLevel.NONE
    val pairs = if (callerCached) pairList else pairList.persist(MEMORY_AND_DISK)
    // BOUNDED DRIVER-SIDE FAST PATH (r16 verdict #2/#3): the verified pair
    // graph is tiny BY CONSTRUCTION — every candidate generator feeding
    // this function caps its buckets, so |pairs| is O(corpus · cap), a few
    // MiB at any corpus size — yet the distributed loop costs 2–10
    // driver-SCHEDULED jobs whose per-job stall risk (not data) was the
    // bench gate's single largest variance source two rounds running
    // (driver q_dedup_semantic 21.3 s vs local 8.6 s, spread 10×; each
    // round is a fixed-cost scheduled job on a tiny label set). When the
    // edge list fits under `localEdgeCap` (16 bytes/edge of payload, but
    // take() lands boxed Rows at ~80-100 bytes each, so the 1 M default
    // is ~100 MiB of TRANSIENT driver allocation — released when
    // localComponents interns into primitive arrays; acceptable against
    // the 100+ GiB driver heap this targets, and the cap exists precisely
    // so a caller on a smaller driver can lower it), collect it in ONE
    // job and run union-find in memory: identical declared semantics
    // (component-min rep, is_rep, cluster_size), property-tested against
    // the distributed loop on the same graphs. take() scans incrementally
    // and stops at cap+1, so an over-cap graph pays one bounded probe
    // (whose computed partitions land in the pairs cache, not wasted) and
    // falls back to the distributed loop below — the 100 TB path is
    // unchanged. Null ids are dropped HERE, matching the distributed
    // path's effective semantics (its propagate() inner-joins on id, so a
    // null-id edge never propagates a label) — without the filter the
    // fast path NPE'd in getLong where the loop silently tolerated nulls.
    if (localEdgeCap > 0) {
      val sample = pairs
        .select(col("a_id").cast("long"), col("b_id").cast("long"))
        .filter(col("a_id").isNotNull && col("b_id").isNotNull)
        .take(localEdgeCap + 1)
      if (sample.length <= localEdgeCap) {
        afterFirstJob()
        if (!callerCached) pairs.unpersist(blocking = true)
        logInfo(s"clusterPairs: driver-side union-find over " +
          s"${sample.length} edge(s)")
        return localComponents(pairList.sparkSession, sample)
      }
      logInfo(s"clusterPairs: edge count exceeds localEdgeCap=$localEdgeCap" +
        " — distributed label propagation")
    }
    // symmetrize with a map-side explode over the cached pairs (a
    // two-branch union would scan the cache twice); edges and labels are
    // each a few rows per near-dup doc (pair counts are bounded by the
    // hot-shingle cap), so the iteration state is tiny relative to the
    // corpus — measured at sf0.1 (graft.AqeAudit): the propagation
    // iterations shuffle <0.1 MiB on top of the 6.2 MiB pair build. Edges
    // needs no persist of its own; every iteration re-derives it from the
    // cached pairs with one cheap explode.
    val edges = pairs.select(explode(array(
        struct(col("a_id").as("src"), col("b_id").as("dst")),
        struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    // Fold the FIRST propagation round into initialization: with labels
    // starting at id, iteration 1's join+union+min reduces to a plain
    // aggregation over the symmetrized edges — label₀ = min(id, min(neighbor
    // ids)) — one groupBy instead of a join round. Near-dup components are
    // near-cliques whose minimum id is almost always a direct neighbor, so
    // this typically converges in ONE confirming round, each saved round
    // being a whole join+agg stage of fixed scheduling cost (the measured
    // per-iteration shuffle is <0.1 MiB; the cost is stages, not bytes).
    // NOT persisted: it is read only inside the first confirming round
    // below, whose plan derives it (twice — join side and union arm) from
    // the cached pairs, a trivial re-aggregation of a few-MiB cache.
    def initLabels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"),
        least(col("src"), col("mn")).as("label"))
    // one shuffle round per propagation: neighbor labels and own label
    // flow through the SAME aggregation, with the self arm tagged so the
    // old label rides along — convergence is then a scan of the cached
    // result instead of a second join against the previous labels
    def propagate(lbl: DataFrame): DataFrame =
      edges.join(lbl, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"), lit(false).as("self"))
        .union(lbl.select(col("id"), col("label"), lit(true).as("self")))
        .groupBy("id").agg(min(col("label")).as("next"),
          max(when(col("self"), col("label"))).as("old"))
    // ONE job materializes the pair build (populating the pairs cache),
    // the folded first round, AND the first confirming round with its
    // changed-count — on the typical clique-heavy graph (changed == 0
    // immediately) the loop below never runs, so label propagation costs
    // a single job end-to-end instead of the former init-count + confirm
    // pair. Every occurrence of the pairs plan inside this one action
    // resolves to the same InMemoryRelation, so the expensive pair build
    // still executes exactly once while its cache fills.
    var prop = propagate(initLabels).persist(MEMORY_AND_DISK)
    var changed = prop.filter(col("next") < col("old")).count()
    afterFirstJob()
    // per-round state is LINEAGE-CUT (re-rooted on the populated cache's
    // own RDD): expressed over the previous round's Dataset directly,
    // round k's logical plan embeds ~3 copies of round k-1's tree —
    // geometric growth that explodes analysis cost (and, from a large
    // pair-source plan like the hyperplane-literal embed candidates, the
    // plan's STRING rendering inside persist()) after a handful of
    // non-converged rounds, long before any data grows. The cut keeps
    // every round's plan constant-size; reads still hit prop's cache.
    def labelsOf(p: DataFrame): DataFrame =
      org.apache.spark.sql.GraftSqlBridge.lineageCut(
        p.select(col("id"), col("next").as("label")))
    // pointer-jump (path doubling): label ← label(label), the label
    // relation self-joined on its own label VALUE. Labels are
    // non-increasing and bounded below by the component min, so the jump
    // is always sound; composing it with each hop collapses label-
    // forwarding chains exponentially, so a diameter-D component
    // converges in O(log D) hop+jump rounds instead of D hop rounds
    // (the path-doubling half of Kiveris et al., "Connected Components
    // in MapReduce and Beyond", public paper). Near-clique dedup graphs
    // converge in 1-2 rounds either way; RELATEDNESS graphs (e.g.
    // moderate-threshold embedding similarity) have real diameter, and
    // there the hop-only loop's round count IS the wall-clock (measured:
    // the sf0.1 embedding graph, diameter 16, ran 14 s hop-only vs ~4 s
    // with jumps — each round is a fixed-cost driver-scheduled job,
    // whatever the data size). The join keys on the tiny label set, never
    // the edge list.
    // inner join, not left: every label VALUE is a node id (mins of node
    // ids), and lbl has a row for every node, so the lookup always hits —
    // stating the invariant instead of dead-coding around it
    def jump(lbl: DataFrame): DataFrame =
      lbl.join(lbl.select(col("id").as("jid"), col("label").as("jlab")),
          col("label") === col("jid"))
        .select(col("id"), least(col("label"), col("jlab")).as("label"))
    var labels = labelsOf(prop)
    // the persisted plan each round's `labels` projects FROM — the
    // handle unpersist must target (unpersisting the projection itself is
    // a silent cache-manager miss, the round-4 leak)
    var prevCached: DataFrame = prop
    var iters = 1
    while (changed > 0 && iters < maxIters) {
      prop = propagate(jump(labels)).persist(MEMORY_AND_DISK)
      changed = prop.filter(col("next") < col("old")).count()
      // prop is materialized by the count; the previous round's cache
      // is now dead weight
      prevCached.unpersist(blocking = true)
      prevCached = prop
      labels = labelsOf(prop)
      iters += 1
    }
    require(changed == 0,
      s"label propagation did not converge in $maxIters iterations")
    // operational telemetry: round count is THE wall-clock driver for this
    // operator at scale (each round is a full driver-scheduled job)
    logInfo(s"clusterPairs converged in $iters round(s)")
    // only the converged prop stays cached (the returned plan reads it);
    // the pair graph is no longer referenced by the normal execution path
    if (!callerCached) pairs.unpersist(blocking = true)
    // component sizes via a window over the converged labels — one exchange
    // on the label key instead of a groupBy + re-join
    labels
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("label")).cast("int"))
      .select(col("id").as("doc_id"), col("label").as("cluster_rep"),
        (col("id") === col("label")).as("is_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** [[clusterPairs]]'s bounded fast path: classic union-find (path
    * halving + union by rank, near-O(α) per edge) over a collected edge
    * list, then component-min relabeling so the output contract is
    * bit-identical to the distributed loop's: (doc_id, cluster_rep =
    * component-min id, is_rep, cluster_size), ordered by doc_id. The
    * result is a LocalRelation of one row per distinct id — bounded by
    * 2·|edges| — with the same trailing contract sort as the distributed
    * path.
    */
  private def localComponents(s: SparkSession,
      edges: Array[org.apache.spark.sql.Row]): DataFrame = {
    import s.implicits._
    val idx = scala.collection.mutable.HashMap.empty[Long, Int]
    val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    def idOf(x: Long): Int =
      idx.getOrElseUpdate(x, { ids += x; ids.size - 1 })
    // intern ids first so the parent array can be sized once
    val e = edges.map(r => (idOf(r.getLong(0)), idOf(r.getLong(1))))
    val n = ids.size
    val parent = Array.tabulate(n)(identity)
    val rank = new Array[Int](n)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    e.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) += 1 }
      }
    }
    val minId = Array.fill(n)(Long.MaxValue)
    val csize = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = find(i)
      if (ids(i) < minId(r)) minId(r) = ids(i)
      csize(r) += 1
      i += 1
    }
    (0 until n).map { j =>
      val r = find(j)
      (ids(j), minId(r), ids(j) == minId(r), csize(r))
    }.toDF("doc_id", "cluster_rep", "is_rep", "cluster_size")
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup via sign-LSH band blocking ([[Hyperplanes]]:
    * 8 bands × 8 fixed ±1 hyperplanes): vectors sharing any 8-bit band key
    * become candidates through a sparse equi-join on (band, key) — random
    * pairs collide with p ≈ 8·2⁻⁸, so the join NEVER degenerates to a block
    * cross-product the way label-only blocking does (the label set is
    * bounded; at 100 TB an O(n²)-within-label join is the classic skew
    * blowup). Candidates are verified with the exact cosine.
    *
    * The banding is part of the declared semantics — the oracle embeds the
    * same hyperplane literals — so the result is deterministic and fully
    * SQL-checkable, while recall at a given cosine follows the standard LSH
    * curve 1-(1-p(θ)⁸)⁸.
    */
  def embedCosine(s: SparkSession, dir: String, threshold: Double = 0.3): DataFrame =
    embedCosineOn(Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")), threshold)

  /** [[embedCosine]] over an arbitrary (vec_id: long,
    * embedding: array&lt;float|double&gt;) frame.
    *
    * `numBands` × `bitsPerBand` sizes the LSH banding to the corpus
    * (default: the fixture's declared 8×8, which the oracle SQL embeds).
    * Expected RANDOM candidate pairs are C(n,2)·bands·2^-bits — quadratic
    * in corpus size at fixed width — so a larger corpus must widen the
    * keys (bits ≈ log2(n)) to keep the candidate join O(n·bands); the
    * round-13 scale sweep (ABLOG_r13) measured 8-bit keys going
    * collision-bound past ~10× the fixture corpus while 16-bit keys hold
    * near-linear growth over the same sweep.
    */
  def embedCosineOn(vecs: DataFrame, threshold: Double = 0.3,
      numBands: Int = Hyperplanes.NumBands,
      bitsPerBand: Int = Hyperplanes.BitsPerBand): DataFrame = {
    // NOT persisted: caching (v, nrm, band keys) for every vector lost its
    // A/B twice — round 5 (MEMORY_AND_DISK, 2.59 s → 3.12 s focused) and
    // round 10 (MEMORY_AND_DISK_SER, 1.44 s → 1.76 s median at sf0.1;
    // ABLOG_r10.md) — the three consumers each prune to a 2-3 column
    // subset, and the pruned parquet re-scans beat materializing the full
    // cached rows. Stage profile (round 10): at sf0.1 the query is
    // orchestration-bound — 2000 vectors, 1.4 MiB total shuffle, ~5
    // sequential AQE stages; stage count is constant in corpus size, so
    // the gap vs the single-process baseline does not widen at 100 TB.
    // native array cast, not transform(_.cast): the HOF is CodegenFallback
    // and would poison whole-stage codegen for the band-key explode stage.
    // vec_clean hoists the null-element scan to this one projection so the
    // 64 plane dots per row below stay branch-free (see Similarity.asDouble)
    val e = vecs.select(col("vec_id"),
      Hyperplanes.vecClean(col("embedding").cast("array<double>")).as("v"))
    // band keys cost 64 hyperplane dots per vector; computed once for the
    // two sides of the self-join
    val keys = e.select(col("vec_id").as("doc_id"),
      posexplode(Hyperplanes.bandKeysWide(col("v"), numBands, bitsPerBand))
        .as(Seq("band", "bkey")))
    // map-side capped pair expansion (same guard as every other dedup
    // path): a degenerate bucket — e.g. many zero/near-identical vectors
    // collapsing to one band key — is skipped above 100 members instead of
    // going quadratic in the self-join. The cap is part of the declared
    // semantics; the oracle SQL applies the same bucket-size filter.
    val cand = bucketPairs(keys, Seq("band", "bkey"), cap = 100)
    // norms once per vector, not once per candidate pair (the oracle's CTE
    // does the same). Zero-norm vectors are EXCLUDED from verification:
    // they have no cosine (ANSI x/0.0 throws), and they all share the
    // all-ones sign pattern, so without the filter a corpus's padding/
    // failed-encode rows would both collide into one band bucket AND
    // kill the query at the divide
    val en = e.select(col("vec_id"), col("v"),
      Hyperplanes.dot64(col("v"), col("v")).as("nrm"))
      .filter(col("nrm") > 0)
    cand
      .join(en.select(col("vec_id").as("a_id"), col("v").as("va"),
        col("nrm").as("na")), "a_id")
      .join(en.select(col("vec_id").as("b_id"), col("v").as("vb"),
        col("nrm").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        Norm.r4(Hyperplanes.dot64(col("va"), col("vb")) /
          (sqrt(col("na")) * sqrt(col("nb")))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("a_id", "b_id")
  }

  /** SemDeDup-style semantic dedup: embedding-space near-dup CLUSTERS with
    * a COMPLETE per-vector assignment — every vector gets (cluster_rep,
    * is_rep, cluster_size), singletons as their own rep — so a pipeline
    * drops semantic duplicates in ONE `filter(!is_rep)` pass over the
    * corpus (Abbas et al. 2023 "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", public paper; there
    * k-means cells bound the pair search — here the sign-LSH bands play
    * that role, keeping candidates O(n·bands) the same way). Composes two
    * oracled primitives: [[embedCosineOn]] pairs feed [[clusterPairs]],
    * and the full assignment is a left join of the (pair-bounded, tiny)
    * label set back onto the vector ids with coalesce-to-self for
    * singletons — the corpus is touched once for pairs and once for the
    * join-back, both equi-keyed on vec_id.
    */
  def semanticClusters(s: SparkSession, dir: String,
      threshold: Double = 0.3): DataFrame =
    semanticClustersOn(Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")), threshold)

  /** [[semanticClusters]] over an arbitrary (vec_id: long,
    * embedding: array&lt;float|double&gt;) frame.
    */
  def semanticClustersOn(vecs: DataFrame,
      threshold: Double = 0.3): DataFrame = {
    val pairs = embedCosineOn(vecs, threshold).select(col("a_id"), col("b_id"))
    val lab = clusterPairs(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    vecs.select(col("vec_id"))
      .join(lab, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("cluster_rep"), col("vec_id")).as("cluster_rep"),
        coalesce(col("is_rep"), lit(true)).as("is_rep"),
        coalesce(col("cluster_size"), lit(1)).as("cluster_size"))
      .orderBy("vec_id")
  }

  /** Registry `q_dedup_incremental` (r19 verdict #8): dedupe a NEW batch
    * against an EXISTING corpus's stored band index — the incremental
    * corpus-refresh shape every training-data pipeline runs between full
    * rebuilds. Fixture split: docs with `doc_id % 3 == 0` are the
    * refresh batch, the rest are the already-landed corpus whose keys
    * seed a scratch [[graft.streaming.BandIndex]]
    * ([[graft.streaming.StreamingNearDedup.recordBatch]], epoch 0); the
    * batch is then deduped against it with the STREAMING policy
    * ([[graft.streaming.StreamingNearDedup.dedupBatchAgainstIndex]],
    * epoch 1) under the `ngram` banding — drop on ANY shared 3-gram
    * shingle with the corpus or with a smaller-id batch doc. The ngram
    * scheme makes the whole decision text-replayable, so this is the
    * family's first ORACLED against-index query (minhash/simhash
    * decisions are sketch-dependent, hence golden-pinned); equivalence
    * with a live two-epoch stream is pinned in IncrementalDedupSpec for
    * both schemes. Output: (doc_id, kept) for every batch doc.
    *
    * Scale posture: the probe is a left-semi join bounded to touched
    * index buckets; within-batch dedup is one min-aggregation; nothing
    * driver-side but the bounded bucket-id set. At 100 TB the corpus
    * never re-scans — only its index's touched buckets do.
    */
  // fixture corpus indexes, one per scale-factor dir, built on first use
  // and reused for the JVM's lifetime: the DECLARED operator shape is
  // "dedupe a refresh batch against an EXISTING corpus index", so
  // rebuilding the index per invocation would make every bench sample
  // measure fixture seeding instead of the serve path. Sound to memoize:
  // the probe is read-only (record = false), the index content is a pure
  // deterministic function of the sf dir, and the scratch prefix embeds
  // the sf name so two fixtures never reuse (or delete) each other's dir.
  private val incIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def incrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.StreamingNearDedup
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val tableDir = incIndexCache.computeIfAbsent(dir, _ => {
      // the sanitized prefix alone can collide across dataset dirs that
      // differ only in punctuation (r20 advice): TempDirs' one-live-dir-
      // per-prefix eviction would then delete an index a cached entry
      // still points at — a short hash of the RAW dir makes the prefix
      // injective per dataset
      val td = graft.TempDirs.scratch(
        "graft_incdedup_" + dir.replaceAll("[^A-Za-z0-9]", "_") + "_" +
          java.lang.Integer.toHexString(
            scala.util.hashing.MurmurHash3.stringHash(dir))) +
        "/corpus.docs"
      StreamingNearDedup.recordBatch(corpus, td,
        StreamingNearDedup.BandingNgram, epochId = 0L)
      td
    })
    val kept = StreamingNearDedup.dedupBatchAgainstIndex(batch, tableDir,
        StreamingNearDedup.BandingNgram, epochId = 1L)
      .select(col("doc_id"), lit(true).as("kept"))
    batch.select("doc_id").join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("kept"), lit(false)).as("kept"))
      .orderBy("doc_id")
  }
}
