package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingestion with cross-epoch NEAR-duplicate dedup — the LSH
  * upgrade of [[StreamingDedup]] (which drops only exact content matches):
  * a document is dropped when it shares ANY MinHash band with ANY earlier
  * arrival — an earlier (smaller doc_id) document of the same batch, or
  * any document of an earlier epoch, kept or dropped alike. Transitive
  * chains collapse to the first arrival: "similar to any earlier arrival,
  * kept or not, drops you" is the declared policy, deterministic given
  * stream order, and it holds ACROSS epochs because the [[BandIndex]]
  * records every arrival's band keys — not just the ones that landed.
  *
  * The banding is IDENTICAL to the batch operator `Dedup.minhashLsh`
  * (word 3-gram shingles → xxhash64 fingerprints → 32 seeded minima via
  * the codegen'd [[graft.functions.MinHashes]] → 8 bands of 4), so a
  * corpus deduped on ingest agrees with what the batch LSH pass would
  * have flagged at the same band threshold. Band keys still land as eight
  * LONG columns next to each kept document (the inspectable, batch-join-
  * friendly shape), but the per-epoch dedup probe reads the compact
  * bucketed [[BandIndex]], NOT the table: each micro-batch's state read
  * is bounded by the index buckets its own keys touch, where the previous
  * design re-read the whole committed corpus's rows every epoch —
  * O(corpus) state reads that a long-running 100 TB ingest cannot afford.
  * No separate state store to size, checkpoint, or compact; the index is
  * rename-published, epoch-idempotent files beside the table.
  *
  * Documents with fewer than 3 tokens have no shingles, hence no
  * similarity evidence: their band columns are NULL and they always pass
  * (null keys never join, and never enter the index).
  */
object StreamingNearDedup {

  val NumHashes = 32
  val NumBands = 8
  val BandSize = 4

  /** Banding scheme names accepted by [[start]]'s `banding` option (r14
    * verdict #4): `minhash` is the default LSH above; `simhash` bands the
    * one-pass 64-bit token SimHash ([[graft.functions.SimHash64]]) into
    * 4 × 16-bit chunks — the batch `Dedup.simhashOn` candidate generator's
    * exact construction — so any earlier arrival within Hamming distance 3
    * shares at least one chunk (pigeonhole) and drops the newcomer. The
    * scheme is a LAYOUT property of the table, recorded in the index's
    * `_meta` at creation and validated on every writer entry.
    */
  val BandingMinHash = "minhash"
  val BandingSimHash = "simhash"

  /** Embedding sign-LSH banding (r18 verdict #4): bands the fixed
    * [[graft.operators.Hyperplanes]] family's 8 × 8-bit keys over an
    * `embedding` column — the batch `q_dedup_embed`/`q_dedup_semantic`
    * candidate generator's exact construction — so SemDeDup-style
    * semantic dedup runs ON INGEST: a new arrival whose embedding is
    * cosine-close to ANY earlier arrival (kept or dropped) shares a band
    * key with it and is dropped before landing.
    */
  val BandingEmbed = "embed"

  /** Exact-shingle banding (r19 verdict #8): every distinct word-level
    * 3-gram shingle's xxhash64 fingerprint is its own band key, so the
    * family's single-collision drop policy becomes "drop an arrival
    * sharing ANY 3-gram window with any earlier arrival" — the aggressive
    * exact-overlap regime of the batch n-gram family, and (unlike
    * minhash/simhash/embed) one an independent engine can replay from the
    * text alone: `q_dedup_incremental`'s DuckDB oracle recomputes the
    * whole decision from string shingles. Key count varies per doc (an
    * `nkeys` array column, exploded by [[bandKeys]]); sub-3-token docs
    * have no keys and always land. Hot shingles are harmless to the probe
    * (a left-semi join has no pair expansion), unlike the batch pair
    * generators that need df caps.
    */
  val BandingNgram = "ngram"

  val SimHashBands = 4
  val SimHashBandBits = 16

  val EmbedBands: Int = graft.operators.Hyperplanes.NumBands // 8
  val EmbedBandBits: Int = graft.operators.Hyperplanes.BitsPerBand // 8

  /** Parse an embed scheme name to its (numBands, bitsPerBand) banding.
    * `embed` is the fixture default (8×8 — matches the batch oracle
    * semantics); `embed-<bands>x<bits>` is the CORPUS-SIZE knob: random
    * pairs collide in a band with p ≈ 2^−bits, so expected false
    * candidates are quadratic in corpus at fixed width — 8 bits suffices
    * at thousands of docs, a 100 TB ingest wants 24+ (the same sizing rule
    * as the batch `Hyperplanes.bandKeysWide`). Bounded by the fixed
    * 256-plane family and the 31-bit int key, like the batch side.
    */
  private[graft] def embedBanding(banding: String): Option[(Int, Int)] =
    banding match {
      case BandingEmbed => Some((EmbedBands, EmbedBandBits))
      case EmbedWide(b, w) =>
        val (nb, bits) = (b.toInt, w.toInt)
        // same bounds as bandKeysWide, checked here so start() fails at
        // construction, not first epoch
        require(nb > 0 && bits > 0 && bits <= 31 &&
          nb * bits <= graft.operators.Hyperplanes.MaxPlanes,
          s"embed banding ${nb}x$bits out of range: need bands>0, " +
            s"0<bits<=31, bands*bits <= ${graft.operators.Hyperplanes.MaxPlanes}")
        Some((nb, bits))
      case _ => None
    }

  private val EmbedWide = raw"embed-(\d+)x(\d+)".r

  /** Consecutive in-loop table-compaction failures tolerated before the
    * query fails: transient FS faults skip the cycle and retry next time;
    * this bounds how long a persistent fault can silently disable
    * compaction.
    */
  val MaxCompactionFailures = 5

  /** Adds band_0..band_7 LSH key columns derived from `text` — the same
    * construction as `Dedup.minhashLsh`, factored over an arbitrary
    * DataFrame so batch corpora and streaming micro-batches band
    * identically.
    */
  def withBands(docs: DataFrame): DataFrame = {
    // `_tk` MUST cross a projection boundary before the shingle transform
    // references it: lambda bodies are evaluated per element OUTSIDE
    // whole-stage codegen's common-subexpression elimination, so an
    // inline `split(text)` would re-split the document for every element
    // access — 3 splits × O(tokens) shingles = O(tokens²) per doc
    // (measured r20 on the ngram scheme: 174k keys in 6.6 s inline vs
    // 0.4 s materialized). CollapseProject keeps the boundary because the
    // alias is referenced more than once and is non-cheap — the same
    // reasoning as the batch side's Dedup.shingledOf.
    val tk = col("_tk")
    val shingles = array_distinct(transform(
      sequence(lit(0), greatest(size(tk) - 3, lit(0))),
      i => concat_ws(" ", tk(i), tk(i + 1), tk(i + 2))))
    val hs = when(size(tk) >= 3, transform(shingles, x => xxhash64(x)))
    val sigCol = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MinHashes(
        org.apache.spark.sql.GraftSqlBridge.expression(col("_hs")),
        NumHashes))
    val withSig = docs.withColumn("_tk", split(col("text"), " "))
      .withColumn("_hs", hs).drop("_tk").withColumn("_sig", sigCol)
    (0 until NumBands).foldLeft(withSig) { (d, b) =>
      // guard on _sig: a null signature (short doc) must yield NULL keys,
      // not the constant hash-of-no-columns every short doc would share
      d.withColumn(s"band_$b", when(col("_sig").isNotNull,
        xxhash64((b * BandSize until (b + 1) * BandSize)
          .map(j => col("_sig")(j)): _*)))
    }.drop("_hs", "_sig")
  }

  /** Adds band_0..band_3 SimHash key columns — 16-bit chunks of the
    * one-pass `simhash64`, each TAGGED with its band index (`b·2¹⁶ +
    * chunk`) so chunk value 5 in band 0 can never collide with chunk 5 in
    * band 1 through the index's single `bk` column: the single-column
    * equivalent of the batch operator's compound `(band_idx, band_key)`
    * join key (`Dedup.simhashOn`). A null text (the only null the
    * expression propagates) yields NULL keys and always passes, like
    * minhash's short docs.
    */
  def withSimHashBands(docs: DataFrame): DataFrame = {
    val sh = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.SimHash64(
        org.apache.spark.sql.GraftSqlBridge.expression(col("text"))))
    val withSig = docs.withColumn("_sh", sh)
    (0 until SimHashBands).foldLeft(withSig) { (d, b) =>
      d.withColumn(s"band_$b",
        shiftright(col("_sh"), b * SimHashBandBits)
          .bitwiseAND(lit((1L << SimHashBandBits) - 1)) +
          lit(b.toLong << SimHashBandBits))
    }.drop("_sh")
  }

  /** Adds band_0..band_7 sign-LSH key columns from `embedding` — the 8-bit
    * hyperplane-sign keys of [[graft.operators.Hyperplanes.bandKey]], each
    * TAGGED with its band index (`b·2⁸ + key`) like the simhash chunks so
    * band b's key space never aliases band b' through the index's single
    * `bk` column. A null/ragged embedding (nulled whole by `vec_clean`)
    * and a zero-norm one (no direction — the cosine family's exclusion)
    * yield NULL keys on every band and always pass, like minhash's short
    * docs.
    */
  def withEmbedBands(docs: DataFrame): DataFrame =
    withEmbedBands(docs, EmbedBands, EmbedBandBits)

  /** [[withEmbedBands]] at an arbitrary `numBands × bitsPerBand` banding
    * over the fixed hyperplane family (the `embed-<bands>x<bits>` scheme).
    */
  def withEmbedBands(docs: DataFrame, numBands: Int,
      bitsPerBand: Int): DataFrame = {
    require(docs.columns.contains("embedding"),
      s"banding '$BandingEmbed' needs an `embedding` column " +
        s"(array<float|double>); the stream has: ${docs.columns.mkString(", ")}")
    import graft.operators.Hyperplanes
    val withV = docs
      .withColumn("_v", Hyperplanes.vecClean(col("embedding").cast("array<double>")))
      .withColumn("_nrm", Hyperplanes.dot64(col("_v"), col("_v")))
    (0 until numBands).foldLeft(withV) { (d, b) =>
      // THE shared construction — see Hyperplanes.bandKeyWide: batch and
      // stream banding must come from one definition
      val key = Hyperplanes.bandKeyWide(col("_v"), b, bitsPerBand)
      d.withColumn(s"band_$b",
        when(col("_v").isNotNull && col("_nrm") > 0,
          key.cast("long") + lit(b.toLong << bitsPerBand)))
    }.drop("_v", "_nrm")
  }

  /** [[withBands]] / [[withSimHashBands]] / [[withEmbedBands]] by declared
    * scheme name. */
  /** Adds the `nkeys` array column for [[BandingNgram]]: xxhash64
    * fingerprints of the doc's distinct word-level 3-gram shingles (the
    * same construction as [[withBands]]'s signature input, minus the
    * MinHash compression — every shingle IS a key). Null for sub-3-token
    * docs, which therefore always land.
    */
  def withNgramBands(docs: DataFrame): DataFrame = {
    // `_tk` crosses a projection boundary for the same O(tokens²) reason
    // as [[withBands]] — see the comment there
    val tk = col("_tk")
    val shingles = array_distinct(transform(
      sequence(lit(0), greatest(size(tk) - 3, lit(0))),
      i => concat_ws(" ", tk(i), tk(i + 1), tk(i + 2))))
    docs.withColumn("_tk", split(col("text"), " "))
      .withColumn("nkeys",
        when(size(tk) >= 3, transform(shingles, x => xxhash64(x))))
      .drop("_tk")
  }

  def withBandsFor(docs: DataFrame, banding: String): DataFrame =
    banding match {
      case BandingMinHash => withBands(docs)
      case BandingSimHash => withSimHashBands(docs)
      case BandingNgram => withNgramBands(docs)
      case e if embedBanding(e).isDefined =>
        val (nb, bits) = embedBanding(e).get
        withEmbedBands(docs, nb, bits)
      case other => throw new IllegalArgumentException(
        s"unknown banding '$other'; supported: $BandingMinHash, " +
          s"$BandingSimHash, $BandingEmbed, $BandingEmbed-<bands>x<bits>")
    }

  /** Exploded (doc_id, band key) rows over WHATEVER band_i columns the
    * frame carries (8 for minhash, 4 for simhash) — derived from the
    * schema so probe, append, and backfill stay banding-agnostic.
    */
  private[streaming] def bandKeys(df: DataFrame): DataFrame =
    // the ngram scheme's keys are a VARIABLE-length array (one key per
    // distinct shingle), carried as `nkeys`; key-less short docs (null
    // array) contribute no rows, like null band_N keys. explode_OUTER,
    // not explode: InferFiltersFromGenerate gives plain explode a
    // `size(nkeys) > 0` pre-filter that filter-pushdown then inlines
    // BELOW the `_tk` projection boundary with the raw split(text)
    // substituted back in — re-introducing the exact O(tokens²)
    // re-split-per-element evaluation the boundary exists to prevent
    // (measured: ~3 s of the sf0.1 corpus key scan was that one inferred
    // filter). The outer variant infers nothing; null keys drop in the
    // cheap attribute filter below.
    if (df.columns.contains("nkeys"))
      df.select(col("doc_id"), explode_outer(col("nkeys")).as("bk"))
        .filter(col("bk").isNotNull)
    else {
      val bandCols = df.columns.filter(_.matches("band_\\d+"))
        .sortBy(_.stripPrefix("band_").toInt)
      df.select(col("doc_id"), explode(array(
          bandCols.map(col(_)).toSeq: _*)).as("bk"))
        .filter(col("bk").isNotNull)
    }

  /** `compactEvery` > 0 folds [[BandIndex.compact]] into the stream loop
    * every that-many epochs (serial with the writer, so the swap is
    * invisible to probes) — the self-maintaining posture a long-running
    * ingest needs to keep per-bucket file counts O(log corpus) instead of
    * O(epochs).
    *
    * Single-writer: start() takes the table's [[BandIndex]] writer lease
    * and FAILS FAST if another live stream holds it — two concurrent
    * writers would race the index's rename-publish and corrupt the dedup
    * state. The lease is renewed every epoch (so a crashed writer's lease
    * goes stale after `leaseStaleMs` and a restart can take over) and
    * released when the query terminates.
    */
  /** `compactTableEvery` > 0 additionally folds a MINOR data-table
    * compaction ([[graft.sink.Compact]] with `deltasOnly`) into the loop:
    * the per-epoch delta files consolidate into one file per cycle, so a
    * downstream batch reader of an unbounded ingest plans O(epochs /
    * compactTableEvery) files instead of O(epochs). Cost per cycle is
    * bounded by bytes ingested since the last one (never table size), and
    * the in-flight epoch is protected so replays stay exact. Off by
    * default: compaction makes a tail restarting from an offset BELOW the
    * consolidation watermark unable to replay those epochs individually —
    * the documented log-compaction trade a deployment opts into.
    */
  /** The single-collision drop decision both the streaming loop and
    * [[dedupBatchAgainstIndex]] apply to one epoch's arrivals — SHARED
    * code, so batch-vs-streaming equivalence holds by construction (and
    * is additionally pinned end-to-end by IncrementalDedupSpec against a
    * live two-epoch stream). A doc is dropped iff any of its band keys
    * was recorded by ANY earlier epoch (kept or dropped arrivals alike —
    * the index records both), or is shared with a smaller-id doc of the
    * same batch ("collides with any smaller id" ≡ "id > the band's
    * minimum id": one min-aggregation, not a self-join that would go
    * quadratic on a duplicate-heavy batch). The ONLY driver-side value is
    * the set of touched index buckets — bounded by [[BandIndex.NumBuckets]]
    * (metadata-scale), never by batch or corpus size; the index read is
    * bounded to those buckets, and the epoch's own files are excluded so
    * a replayed half-written attempt can never collide with itself.
    */
  private[graft] def dropsFor(keys: DataFrame, tableDir: String,
      epochId: Long): DataFrame = {
    val spark = keys.sparkSession
    val touched = keys.select(BandIndex.bucket(col("bk")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val indexHit = keys.join(
        BandIndex.readKeys(spark, tableDir, touched, epochId),
        Seq("bk"), "left_semi").select(col("doc_id"))
    val bandMin = keys.groupBy("bk").agg(min(col("doc_id")).as("first_id"))
    val withinHit = keys.join(bandMin, "bk")
      .filter(col("doc_id") > col("first_id"))
      .select(col("doc_id"))
    indexHit.union(withinHit).distinct()
  }

  /** Record a batch's band keys in a table's index WITHOUT a dedup
    * decision — the seeding half of the incremental-refresh shape: stand
    * up an index over an already-landed corpus (every row's keys, as
    * `epochId`), then let later [[dedupBatchAgainstIndex]] calls probe
    * it. Creates the index (and its `_meta` layout record) when absent;
    * fails loudly on a banding mismatch with an existing one.
    */
  def recordBatch(docs: DataFrame, tableDir: String,
      banding: String = BandingMinHash, epochId: Long = 0L): Unit = {
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(docs.sparkSession.sparkContext.hadoopConfiguration)
    BandIndex.ensureMeta(fs, tableDir, banding)
    BandIndex.append(bandKeys(withBandsFor(docs, banding)), tableDir, epochId)
  }

  /** Batch dedup against a STORED corpus index (r19 verdict #8): the
    * incremental corpus-refresh shape every training-data pipeline runs —
    * dedupe a NEW batch of documents against everything an existing
    * table's [[BandIndex]] has recorded, without running a stream.
    * Applies EXACTLY the streaming policy ([[dropsFor]]) and returns the
    * batch's kept rows (banding columns included). Read-only by default;
    * `record = true` additionally appends the batch's keys — ALL
    * arrivals, kept and dropped, the policy's bookkeeping invariant — as
    * `epochId`, making this refresh part of the corpus the next one
    * probes.
    */
  def dedupBatchAgainstIndex(batch: DataFrame, tableDir: String,
      banding: String = BandingMinHash, epochId: Long,
      record: Boolean = false): DataFrame =
    dedupBatchAgainstIndexManaged(batch, tableDir, banding, epochId,
      record)._1

  /** [[dedupBatchAgainstIndex]] with the cache lifetime EXPOSED (r21
    * advice): returns the kept frame plus a `release()` callback that
    * unpersists the two batch-sized caches backing it. A pipeline running
    * repeated corpus refreshes calls `release()` once the kept rows are
    * materialized (written/landed); without it every refresh accumulates
    * two batch-sized caches until session teardown. `release()` is safe
    * to call at any point — the kept frame stays CORRECT afterwards (the
    * caches back a lazy plan, so a later action simply recomputes the
    * banding), it only stops being cheap. The plain overload keeps the
    * session-scoped lifetime for single-shot callers (the bench's
    * reclaim() and the oracle dump both sweep persistent RDDs).
    */
  def dedupBatchAgainstIndexManaged(batch: DataFrame, tableDir: String,
      banding: String = BandingMinHash, epochId: Long,
      record: Boolean = false): (DataFrame, () => Unit) = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // the banding (split + shingle + xxhash64 over every document) feeds
    // four consumers — dropsFor's touched-bucket collect, its index probe
    // and within-batch min-agg, and the final left-anti join (five with
    // record's index append) — the same fan-out the streaming epoch loop
    // persists for (see start()); unpersisted, a 100 TB refresh batch
    // re-scans and re-hashes the banding 4-5× (r20 verdict #1).
    // dropsFor's touched-bucket collect materializes both caches eagerly,
    // so every later consumer reads the cache. The caches back the
    // RETURNED (lazy) kept frame, so they are not released here — the
    // caller owns the moment via the returned callback. The streaming
    // loop is unaffected: it persists/unpersists its own frames per epoch.
    val banded = withBandsFor(batch, banding).persist(MEMORY_AND_DISK)
    val keys = bandKeys(banded).persist(MEMORY_AND_DISK)
    val kept = banded.join(dropsFor(keys, tableDir, epochId),
      Seq("doc_id"), "left_anti")
    if (record) BandIndex.append(keys, tableDir, epochId)
    (kept, () => {
      keys.unpersist(blocking = false)
      banded.unpersist(blocking = false)
    })
  }

  def start(
      docs: DataFrame,
      path: String, db: String, table: String,
      checkpoint: String,
      compactEvery: Int = 0,
      leaseStaleMs: Long = 10L * 60 * 1000,
      compactTableEvery: Int = 0,
      banding: String = BandingMinHash,
      sinkOptions: Map[String, String] = Map.empty): StreamingQuery = {
    require(banding == BandingMinHash || banding == BandingSimHash ||
      banding == BandingNgram || embedBanding(banding).isDefined,
      s"unknown banding '$banding'; supported: $BandingMinHash, " +
        s"$BandingSimHash, $BandingNgram, $BandingEmbed, " +
        s"$BandingEmbed-<bands>x<bits>")
    val tableDir = s"$path/$db.$table"
    val owner = java.util.UUID.randomUUID.toString
    // consecutive in-loop table-compaction failures: transient FS faults
    // reset it; a PERSISTENT fault (programming error, dead mount) must
    // eventually fail the query instead of silently never compacting again
    val compactionFailures = new java.util.concurrent.atomic.AtomicInteger(0)
    // doubles as the monitor serializing every renew against the release:
    // without it the heartbeat could re-create the lock file in the window
    // right after stop() deleted it
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    BandIndex.acquireLease(docs.sparkSession, tableDir, owner, leaseStaleMs)
    // from here on the lease must not leak: if query CONSTRUCTION fails
    // (bad checkpoint, analysis error), release immediately rather than
    // blocking every retry for leaseStaleMs
    val query = try { docs.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
        // per-epoch split-brain tripwire: fail the query if another writer
        // broke our stale lease and took over (skipped once released —
        // the query is already stopping)
        released.synchronized {
          if (!released.get()) BandIndex.renewLease(spark, tableDir, owner)
        }
        // heal a pre-index table before the first probe — without this, a
        // jar upgrade resuming over an old banded table would probe an
        // empty index and re-land every near-dup of the prior corpus.
        // Passing the epoch makes a replayed FIRST epoch skip backfilling
        // its own landed rows (it would collide with itself); the call also
        // creates the index dir before the data commit, closing that window
        // for every later epoch
        BandIndex.ensureBackfilled(spark, tableDir, replayingEpoch = epochId,
          banding = banding)
        val banded = withBandsFor(batch, banding).persist(MEMORY_AND_DISK)
        // the batch's keys feed four consumers (touched-bucket listing,
        // index probe, within-batch minima, index append) — persist once
        val keys = bandKeys(banded).persist(MEMORY_AND_DISK)
        val drops = dropsFor(keys, tableDir, epochId)
        banded.join(drops, Seq("doc_id"), "left_anti")
          .write.format("graft-streaming").mode("append")
          // passthrough first: the routing/epoch options below are the
          // dedup loop's contract and always win. The embed scheme's
          // streams carry an array `embedding` column, which the default
          // jsonl landing (reference JSON-scalar contract) rejects — pass
          // format=parquet/orc here to land vector payloads columnar.
          .options(sinkOptions)
          .option("path", path).option("db", db).option("table", table)
          .option(graft.sink.GraftSinkOptions.COMMIT_EPOCH, epochId)
          .save()
        // index append AFTER the data commit (see BandIndex crash/replay
        // protocol) — and it records EVERY arrival, kept or dropped
        BandIndex.append(keys, tableDir, epochId)
        if (compactEvery > 0 && (epochId + 1) % compactEvery == 0)
          BandIndex.compact(spark, tableDir, protectEpoch = epochId)
        if (compactTableEvery > 0 && (epochId + 1) % compactTableEvery == 0)
          // best-effort maintenance: an external major compaction holding
          // the compactor lock (or a leftover lock from a crash mid-cycle)
          // skips THIS cycle rather than killing the whole ingest query —
          // the next cycle retries. The lock keeps its own 30-min
          // staleness default: tying it to the (possibly much shorter)
          // writer-lease staleness would steal the lock from a LIVE
          // long-running external compactor and run two compactors at once
          // NonFatal, not just the lock's IllegalStateException: a transient
          // FS fault mid-consolidation (IOException during the concat,
          // FileNotFoundException from ladder sizing under external file
          // drift) is equally recoverable — compaction is crash-safe by
          // design, so skipping the cycle is the right move for a
          // TRANSIENT fault. MaxCompactionFailures consecutive failures
          // mean the fault is persistent (programming error, dead mount):
          // rethrow and fail the query loudly rather than silently never
          // compacting for the rest of an unbounded ingest.
          try {
            graft.sink.Compact.run(tableDir,
              spark.sparkContext.hadoopConfiguration,
              protectEpoch = epochId, deltasOnly = true)
            compactionFailures.set(0)
          }
          catch {
            // a held compactor lock is COORDINATION, not a fault: an
            // external compaction (or a crash leftover that goes stale on
            // the lock's own 30-min clock) legitimately spans many fast
            // epochs, and counting it toward escalation would kill the
            // ingest on a state that self-heals by design. Skip, never
            // escalate.
            case e: IllegalStateException =>
              System.err.println(
                s"[graft] skipping in-loop table compaction (epoch " +
                  s"$epochId): ${e.getMessage}")
            case e if scala.util.control.NonFatal(e) =>
              val n = compactionFailures.incrementAndGet()
              // full class + stack trace: e.getMessage alone is null for
              // NPE and hides where a persistent programming error lives
              System.err.println(
                s"[graft] skipping in-loop table compaction (epoch $epochId, " +
                  s"consecutive failure $n/$MaxCompactionFailures): $e")
              e.printStackTrace()
              if (n >= MaxCompactionFailures) throw new IllegalStateException(
                s"in-loop table compaction of $tableDir failed " +
                  s"$MaxCompactionFailures consecutive cycles — the fault is " +
                  "persistent, not transient; failing the query instead of " +
                  "silently never compacting again.", e)
          }
        keys.unpersist()
        banded.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
    } catch {
      case e: Throwable =>
        BandIndex.releaseLease(docs.sparkSession, tableDir, owner)
        throw e
    }
    val session = docs.sparkSession
    // Heartbeat DAEMON, not per-epoch renewal alone: foreachBatch only runs
    // when data arrives, so an idle-but-healthy stream (or one epoch longer
    // than leaseStaleMs) would let its lease go stale and a second starter
    // break it — the exact two-writer corruption the lease exists to
    // prevent. The daemon renews at leaseStaleMs/4 while the query is
    // active; the per-epoch renew stays as the split-brain tripwire that
    // actually fails the batch. released guards double-release and stops
    // the daemon renewing a lease we no longer own — renew and release
    // hold the same monitor, so a renew can never recreate the lock in
    // the window right after a release deleted it.
    def releaseOnce(): Unit = released.synchronized {
      if (released.compareAndSet(false, true))
        BandIndex.releaseLease(session, tableDir, owner)
    }
    val heartbeat = new Thread(() => {
      try {
        var usurped = false
        while (!usurped && !released.get() && query.isActive) {
          Thread.sleep(math.max(leaseStaleMs / 4, 50L))
          try released.synchronized {
            if (!released.get() && query.isActive)
              BandIndex.renewLease(session, tableDir, owner)
          } catch {
            // lost the lease (another writer took over a stale lock): stop
            // heartbeating a lock that is no longer ours — the per-epoch
            // tripwire fails the query on its next batch
            case _: IllegalStateException => usurped = true
            // a transient fs hiccup must NOT kill the daemon: dying here
            // silently reopens the idle-writer stale-lease window the
            // heartbeat exists to close; retry on the next tick
            case e if scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[graft] lease heartbeat for $tableDir: ${e.getMessage}")
          }
        }
      } catch { case _: InterruptedException => () }
      // covers the registration race too: if the query died before the
      // listener below was added (its event already delivered), the
      // heartbeat's exit path still releases
      if (!query.isActive) releaseOnce()
    }, s"graft-lease-heartbeat-$table")
    heartbeat.setDaemon(true)
    heartbeat.start()
    // backup release on termination events (failure path). If the process
    // dies outright, the lease goes stale and the next starter reclaims it.
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == query.id) {
          releaseOnce()
          heartbeat.interrupt()
          session.streams.removeListener(this)
        }
    }
    session.streams.addListener(listener)
    // SYNCHRONOUS release on stop(): listener delivery is asynchronous, so
    // without this the natural stop-then-restart on the same table would
    // spuriously fail acquireLease until the event drained
    new LeasedQuery(query, () => { releaseOnce(); heartbeat.interrupt() })
  }

  /** Delegating [[StreamingQuery]] whose stop() also releases the writer
    * lease synchronously — callers restart on the same table immediately
    * after stop() returns.
    */
  private final class LeasedQuery(q: StreamingQuery, onStop: () => Unit)
    extends StreamingQuery {
    override def name: String = q.name
    override def id: java.util.UUID = q.id
    override def runId: java.util.UUID = q.runId
    override def sparkSession: org.apache.spark.sql.SparkSession =
      q.sparkSession.asInstanceOf[org.apache.spark.sql.SparkSession]
    override def isActive: Boolean = q.isActive
    override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] =
      q.exception
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus =
      q.status
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      q.recentProgress
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      q.lastProgress
    override def awaitTermination(): Unit = q.awaitTermination()
    override def awaitTermination(timeoutMs: Long): Boolean =
      q.awaitTermination(timeoutMs)
    override def processAllAvailable(): Unit = q.processAllAvailable()
    override def stop(): Unit = { q.stop(); onStop() }
    override def explain(): Unit = q.explain()
    override def explain(extended: Boolean): Unit = q.explain(extended)
  }
}
