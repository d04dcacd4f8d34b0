package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ingest-dedup benchmark: measures per-epoch wall time of
  * [[graft.streaming.StreamingNearDedup]] across many epochs to show the
  * per-epoch cost stays FLAT while the committed corpus grows — the axis
  * the bucketed [[graft.streaming.BandIndex]] exists for. The pre-index
  * design re-read every committed row's band keys each micro-batch, so its
  * per-epoch time grew linearly with the corpus; with the index, each epoch
  * reads only the (8-byte-key) buckets its own batch touches.
  *
  * Fixture: deterministic synthetic docs, ~25 tokens each, with a fixed
  * fraction (default 20%) of near-duplicates of earlier docs (one token
  * changed) so the dedup path — index probe, within-batch minima, drops —
  * does real work every epoch.
  *
  * Prints ONE JSON line: per-epoch seconds, docs/s overall, and the
  * late/early flatness ratio (MEDIAN of the last 3 epochs / median of
  * epochs 2-4; epoch 1 is excluded as warm-up, and medians keep one host
  * transient from faking a growth trend). Env knobs:
  * SPARK_GRAFT_DEDUP_EPOCHS (default 16), SPARK_GRAFT_DEDUP_DOCS (docs per
  * epoch, default 2000), SPARK_GRAFT_DEDUP_COMPACT_EVERY (default 4).
  */
object DedupBench {
  def main(args: Array[String]): Unit = {
    // the flatness ratio needs epochs 1-3 and a distinct last-3 window
    val epochs =
      math.max(7, sys.env.getOrElse("SPARK_GRAFT_DEDUP_EPOCHS", "16").toInt)
    // rounded UP to a multiple of 10: the fixture's "dups never chain"
    // guarantee needs the cross-epoch seed i - docsPerEpoch - 3 to stay
    // ≡ 6 (mod 10) — true only when docsPerEpoch ≡ 0 — else a seed can
    // itself be a mutated doc and chained near-dups skew the drop rate
    // the flatness evidence relies on
    val docsPerEpoch = {
      val raw = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "2000").toInt
      math.max(10, ((raw + 9) / 10) * 10)
    }
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_DEDUP_COMPACT_EVERY", "4").toInt
    // 0 = off (default): in-loop minor table compaction is an opt-in
    val compactTableEvery =
      sys.env.getOrElse("SPARK_GRAFT_DEDUP_COMPACT_TABLE_EVERY", "0").toInt
    // banding scheme under test: minhash (default), simhash (4 tagged
    // 16-bit chunks), or embed (8 tagged 8-bit sign-LSH keys over a
    // synthetic embedding stream) — the same index/probe machinery; drop
    // RATES differ by design, the flatness ratios are the comparable part
    val banding = sys.env.getOrElse("SPARK_GRAFT_DEDUP_BANDING",
      graft.streaming.StreamingNearDedup.BandingMinHash)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // ~25-token docs; 10% near-dup a doc of the SAME epoch (within-batch
    // hits) and 10% a doc of the PREVIOUS epoch (cross-epoch index hits),
    // each with one token changed. Base docs (i ≡ 4 or 6 mod 10 referenced
    // below are themselves ≡ 0 / 6 mod 10) are never mutated, so dups never
    // chain. The token modulus is > any practical doc count — accidental
    // exact dups would silently inflate the drop rate (a 50k-period first
    // draft dropped 68% of a 160k-doc run instead of the intended ~20%).
    def doc(i: Long): (Long, String) = {
      val seed =
        if (i % 10 == 4) i - 4
        else if (i % 10 == 9 && i >= docsPerEpoch) i - docsPerEpoch - 3
        else i
      val toks = (0 until 25).map(t => s"w${(seed * 31 + t * 7) % 1000003}-$t")
      val mutated =
        if (seed != i) toks.updated(12, s"mut$i") else toks
      (i, mutated.mkString(" "))
    }

    // embed-scheme fixture (r19): same seed/dup structure, but the doc IS
    // a 64-dim vector — near-dups nudge one coordinate, so they stay
    // cosine-close and (usually) share a sign-LSH band. Drop RATES differ
    // from the text schemes by design (8-bit bands saturate at bench
    // corpus sizes — the documented scale knob is wider bands); the
    // flatness ratios are the comparable part, and the index still
    // records EVERY arrival, so the state it probes grows identically.
    def vec(i: Long): (Long, Seq[Double]) = {
      val seed =
        if (i % 10 == 4) i - 4
        else if (i % 10 == 9 && i >= docsPerEpoch) i - docsPerEpoch - 3
        else i
      val v = (0 until 64).map { d =>
        var h = seed * 0x9E3779B97F4A7C15L + d * 0xBF58476D1CE4E5B9L
        h ^= (h >>> 31); h *= 0x94D049BB133111EBL; h ^= (h >>> 29)
        (math.floorMod(h, 2000003L).toDouble / 1000001.5) - 1.0
      }
      val mutated =
        if (seed != i) {
          val d = (i % 64).toInt
          v.updated(d, v(d) + 0.05)
        } else v
      (i, mutated)
    }

    // covers the parameterized embed-<bands>x<bits> names too
    val isEmbed =
      graft.streaming.StreamingNearDedup.embedBanding(banding).isDefined
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupbench").toString
    // vector payloads and the ngram scheme's variable `nkeys` key array
    // need the columnar landing (jsonl is scalar-only)
    val sinkOpts =
      if (isEmbed ||
          banding == graft.streaming.StreamingNearDedup.BandingNgram)
        Map(graft.sink.GraftSinkOptions.FORMAT ->
          graft.sink.GraftSinkOptions.FORMAT_PARQUET)
      else Map.empty[String, String]
    // prepare(lo) builds the fixture batch OUTSIDE the timed window (the
    // r19 review caught generation drifting inside it, which pads every
    // epoch with a constant and biases the flatness ratio toward 1) and
    // returns a thunk that only enqueues
    val (docsDF, prepare) =
      if (isEmbed) {
        val in = MemoryStream[(Long, Seq[Double])]
        (in.toDF().toDF("doc_id", "embedding"),
          (lo: Long) => {
            val batch = (lo until lo + docsPerEpoch).map(vec)
            () => { in.addData(batch: _*); () }
          })
      } else {
        val in = MemoryStream[(Long, String)]
        (in.toDF().toDF("doc_id", "text"),
          (lo: Long) => {
            val batch = (lo until lo + docsPerEpoch).map(doc)
            () => { in.addData(batch: _*); () }
          })
      }
    val q = graft.streaming.StreamingNearDedup.start(
      docsDF,
      dir, "bench", "docs", s"$dir/_cp", compactEvery = compactEvery,
      compactTableEvery = compactTableEvery, banding = banding,
      sinkOptions = sinkOpts)

    val epochSecs = (0 until epochs).map { e =>
      val enqueue = prepare(e.toLong * docsPerEpoch)
      val t0 = System.nanoTime()
      enqueue()
      q.processAllAvailable()
      (System.nanoTime() - t0) / 1e9
    }
    q.stop()

    val landed = graft.sink.CommitLog
      .readCommitted(spark, s"$dir/bench.docs").count()
    val total = epochSecs.sum
    // flatness: late epochs (corpus ~epochs× larger) vs early epochs;
    // epoch 1 excluded — it pays JIT/codegen for the whole pipeline.
    // MEDIANS, not means: same rationale as the query bench — one host
    // transient on a single epoch must not fake a growth trend. Computed
    // over PROBE epochs only: a compaction epoch landing in one window
    // but not the other would skew the very ratio the flat-probe claim
    // rests on (the compaction series gets its own ratio below). An epoch
    // counts as compaction if EITHER maintenance loop fires on it.
    def median(xs: Seq[Double]) = { val s = xs.sorted; s(s.size / 2) }
    val isCompact = (e: Int) =>
      (compactEvery > 0 && (e + 1) % compactEvery == 0) ||
        (compactTableEvery > 0 && (e + 1) % compactTableEvery == 0)
    val probeSecs = epochSecs.zipWithIndex.collect {
      case (s, e) if !isCompact(e) => s
    }
    // the epochs floor above guarantees 7 RAW epochs, not 7 probe epochs:
    // compact_every=1 makes every epoch a compaction epoch, and small
    // runs can leave the early/late windows overlapping — report null
    // rather than a self-comparing (or crashing) ratio
    val flatness =
      if (probeSecs.size >= 7)
        f"${median(probeSecs.takeRight(3)) / median(probeSecs.slice(1, 4))}%.3f"
      else "null"
    // compaction epochs separately: the tiered (LSM) compaction claims the
    // PER-COMPACTION cost stays flat while the corpus grows — the old
    // full-rewrite design's cost grew with the corpus even though probe
    // epochs stayed flat. Ratio skips the first compaction (JIT, like
    // epoch 1 above) and needs enough samples to mean anything.
    val compactSecs = epochSecs.zipWithIndex.collect {
      case (s, e) if isCompact(e) => s
    }
    val compactFlat =
      if (compactSecs.size >= 7)
        f"${median(compactSecs.takeRight(3)) / median(compactSecs.slice(1, 4))}%.3f"
      else "null"
    val compactJson = compactSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    // per-tier file shape: the probe-side bound the tiering maintains
    val st = graft.streaming.BandIndex.stats(spark, s"$dir/bench.docs")
    // live manifest shape of the DATA table — with in-loop minor
    // compaction the negative (minor) count must stay O(log), not one per
    // cycle (each epoch commit's tombstone guard opens every negative)
    val manifests = new graft.sink.CommitLog(s"$dir/bench.docs",
      spark.sparkContext.hadoopConfiguration).committedEpochs()
    val (minors, deltas) = manifests.partition(_ < 0)
    val secsJson = epochSecs.map(s => f"$s%.3f").mkString("[", ",", "]")
    println(s"""{"metric":"near_dedup_ingest","banding":"$banding","epochs":$epochs,"docs_per_epoch":$docsPerEpoch,"compact_every":$compactEvery,"compact_table_every":$compactTableEvery,"epoch_secs":$secsJson,"docs_per_sec":${(epochs.toLong * docsPerEpoch / total).toLong},"landed_rows":$landed,"late_over_early":$flatness,"compact_epoch_secs":$compactJson,"compact_late_over_early":$compactFlat,"index_delta_epochs":${st.deltaEpochs},"index_runs":${st.runs},"index_max_files_per_bucket":${st.maxFilesPerBucket},"table_minor_manifests":${minors.size},"table_delta_manifests":${deltas.size}}""")
    spark.stop()
  }
}
