package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index lifecycle (r18 verdict #3): save/load of the
  * FULL search model — coarse codebook, product quantizer, and the encoded
  * corpus — so a NEW session serves probes without retraining or touching
  * the float corpus.
  *
  * Layout under `basePath`:
  *   - `pq_model/`  one-row parquet: format version, m, ksub, flat PQ
  *     codebook, and (residual models) the flat coarse array the quantizer
  *     was trained against — the pairing [[Similarity.ivfPqSearch]]
  *     enforces bit-for-bit survives parquet because doubles round-trip
  *     exactly.
  *   - `coarse/`    the (c_id, cv) coarse codebook (≤ 65536 rows —
  *     metadata-sized, same cap as the in-session collect).
  *   - `codes/`     the [[Similarity.pqEncodeOn]] corpus, PARTITIONED BY
  *     `list_id`: a probe's `nprobe`-list candidate filter becomes
  *     partition PRUNING on the stored table, so serving reads only the
  *     probed lists' code files — at 100 TB the scan cost per probe is
  *     O(corpus · nprobe / cells) code bytes, never the table.
  *
  * The codes table is an ordinary parquet relation, so the same frame can
  * land through the sink's manifest-governed writer where a deployment
  * wants transactional appends; the layout contract here is only the three
  * directory names and the partition column.
  */
object AnnIndexIO extends org.apache.spark.internal.Logging {

  val FormatVersion = 1
  val ModelDir = "pq_model"
  val CoarseDir = "coarse"
  val CodesDir = "codes"
  val StatsDir = "fit_stats"

  /** Appended-batch drift threshold (r19 verdict #5): an append whose mean
    * coarse residual norm ([[Similarity.coarseFitStats]]) exceeds
    * the TRAIN-time baseline by this ratio is flagged — the frozen
    * quantizers were trained on a different distribution and recall over
    * the new rows degrades silently otherwise. 1.5× is calibrated against
    * the fixture: in-distribution appends land within a few percent of
    * 1.0 (the stat is an average over the batch), while a genuinely
    * shifted batch (off-manifold direction) reads several-fold higher.
    * The flag is a RE-TRAIN SIGNAL, not a refusal: the append still
    * lands (the codes are still ADC-comparable — same model), and the
    * operator decides when to pay the retrain.
    */
  val DriftRatioThreshold = 1.5

  /** What [[append]] observed about the batch it encoded: the batch's fit
    * stat, the stored train-time baseline (absent for indexes saved by a
    * pre-stats build), their ratio, and the threshold verdict.
    */
  final case class DriftReport(batchRows: Long, batchMeanDist: Double,
      trainMeanDist: Option[Double], ratio: Option[Double],
      drifted: Boolean)

  private def writeStats(s: SparkSession, basePath: String, kind: String,
      seq: Long, n: Long, meanDist: Double): Unit = {
    import s.implicits._
    Seq((seq, kind, n, meanDist))
      .toDF("seq", "kind", "n", "mean_dist")
      .coalesce(1)
      .write.mode("append").parquet(s"$basePath/$StatsDir")
  }

  private def readStats(s: SparkSession, basePath: String): Array[(Long, String, Long, Double)] =
    try {
      s.read.parquet(s"$basePath/$StatsDir")
        .collect()
        .map(r => (r.getAs[Long]("seq"), r.getAs[String]("kind"),
          r.getAs[Long]("n"), r.getAs[Double]("mean_dist")))
        .sortBy(_._1)
    } catch { case _: org.apache.spark.sql.AnalysisException => Array.empty }

  /** Persist a trained index: `coarse`/`pq` from
    * [[Similarity.ivfPqTrain]], `encoded` from [[Similarity.pqEncodeOn]].
    * Overwrites any index already at `basePath` (the swap is per-directory
    * — readers of a live index should point at a versioned path and flip a
    * pointer, the same publish discipline as the sink's manifests).
    */
  def save(basePath: String, coarse: DataFrame, pq: PqModel,
      encoded: DataFrame, fitSource: Option[DataFrame] = None): Unit = {
    val s = coarse.sparkSession
    import s.implicits._
    Seq((FormatVersion, pq.m, pq.ksub, pq.codebook.toSeq,
        pq.residualCoarse.map(_.toSeq)))
      .toDF("version", "m", "ksub", "codebook", "residual_coarse")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$basePath/$ModelDir")
    coarse.write.mode("overwrite").parquet(s"$basePath/$CoarseDir")
    // co-partition on list_id before the partitioned write: without it
    // every write task emits a file into every list directory it sees
    // (tasks × lists small files at scale); hashed on the partition column,
    // each list's rows land in one task, so file count is bounded by
    // min(lists, shuffle partitions) — the one shuffle this lifecycle pays
    encoded.repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$basePath/$CodesDir")
    // train-time fit baseline for append-drift detection: the encoded
    // frame is codes-only (the raw vectors are gone), so the caller passes
    // the corpus it encoded as `fitSource` — one extra map-side aggregate
    // at save time is the price of a loud drift signal on every later
    // append. Indexes saved without it still load and serve; appends then
    // report `trainMeanDist = None` rather than a ratio.
    fitSource.foreach { src =>
      val (n, meanDist) = Similarity.coarseFitStats(src, coarse)
      if (n > 0)
        writeStats(coarse.sparkSession, basePath, "train", 0L, n, meanDist)
    }
  }

  /** Reopen a saved index: (coarse codebook, PQ model, encoded codes).
    * The codes frame is a lazy relation — nothing scans until a search
    * runs, and the search's list filter prunes to the probed partitions.
    */
  def load(s: SparkSession, basePath: String): (DataFrame, PqModel, DataFrame) = {
    val mrows = s.read.parquet(s"$basePath/$ModelDir").collect()
    require(mrows.length == 1,
      s"ann index at $basePath: expected exactly one model row, got " +
        s"${mrows.length} — not a saved index or a torn write")
    val m = mrows.head
    val version = m.getAs[Int]("version")
    require(version == FormatVersion,
      s"ann index at $basePath: format version $version, this build " +
        s"reads $FormatVersion")
    val pq = PqModel(
      m.getAs[Int]("m"), m.getAs[Int]("ksub"),
      m.getAs[scala.collection.Seq[Double]]("codebook").toArray,
      Option(m.getAs[scala.collection.Seq[Double]]("residual_coarse"))
        .map(_.toArray))
    (s.read.parquet(s"$basePath/$CoarseDir"), pq,
      s.read.parquet(s"$basePath/$CodesDir"))
  }

  /** Append NEW vectors to a saved index without retraining: encode them
    * against the STORED model (the same coarse + product quantizers every
    * existing code was produced by — using any other model would corrupt
    * ADC comparability) and add the resulting codes to the partitioned
    * table. This is the incremental-ingest half of the lifecycle: train
    * once, then append batches forever; only a quantizer RETRAIN (a
    * deliberate, rare event) rewrites the index. Duplicate `vec_id`s are
    * the caller's contract, as in any append-only table.
    */
  def append(basePath: String, vecs: DataFrame): DriftReport = {
    val s = vecs.sparkSession
    val (coarse, pq, _) = load(s, basePath)
    Similarity.pqEncodeOn(vecs, coarse, pq)
      .repartition(col("list_id"))
      .write.mode("append").partitionBy("list_id")
      .parquet(s"$basePath/$CodesDir")
    // drift check (r19 verdict #5): encoding against the frozen model is
    // correct by construction, but a batch drawn from a SHIFTED
    // distribution is quantized with silently larger error — recall over
    // those rows degrades with no failing operation anywhere. Fold the
    // batch's coarse-fit stat, persist it beside the train baseline, and
    // make the comparison the append's RETURN VALUE (plus a warning log)
    // so a 100 TB ingest loop has a retrain signal it can alert on.
    val stats = readStats(s, basePath)
    val (bn, bDist) = Similarity.coarseFitStats(vecs, coarse)
    val nextSeq = if (stats.isEmpty) 1L else stats.map(_._1).max + 1L
    if (bn > 0) writeStats(s, basePath, "append", nextSeq, bn, bDist)
    val train = stats.find(_._2 == "train").map(_._4)
    val ratio = train.filter(_ > 0).map(bDist / _)
    val drifted = ratio.exists(_ > DriftRatioThreshold)
    if (drifted) logWarning(
      s"ann index at $basePath: appended batch mean coarse residual norm " +
        f"$bDist%.4f is ${ratio.get}%.2f× the train baseline " +
        f"${train.get}%.4f (threshold $DriftRatioThreshold) — recall over " +
        "the new rows is degraded; schedule a quantizer retrain")
    DriftReport(bn, bDist, train, ratio, drifted)
  }

  /** Serve one probe from a saved index: codes-only ADC over the probed
    * (pruned) lists, exact rerank against `rerankVecs` — the only stage
    * that reads float vectors, via broadcast point-fetch of ≤ `rerank`
    * ids. Identical top-k to the in-session [[Similarity.ivfPqSearch]]
    * over the pre-save frames (round-trip asserted in AnnIndexIOSpec).
    */
  def searchStored(s: SparkSession, basePath: String, rerankVecs: DataFrame,
      probeVec: Seq[Double], k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val (coarse, pq, codes) = load(s, basePath)
    Similarity.ivfPqSearch(codes, rerankVecs, probeVec, coarse, pq,
      k, nprobe, rerank)
  }
}
