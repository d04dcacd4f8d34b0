package graft.streaming

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Compact bucketed side index of LSH band keys for streaming near-dedup —
  * the structure that bounds [[StreamingNearDedup]]'s per-epoch state read.
  *
  * Without it, each micro-batch re-read the ENTIRE committed table (full
  * JSON rows) just to extract band keys: O(corpus) per epoch, fine at test
  * scale and a scale-killer for a long-running 100 TB ingest. The index
  * stores ONLY the 8-byte band keys, laid out as
  * `<table>/_banddex/bucket=<b>/epoch-<e>-<i>.parquet` with
  * `b = bk mod NumBuckets`, so an incoming batch reads just the buckets its
  * own keys hash into — per-epoch bytes bounded by
  * |touched buckets| / NumBuckets of the (already tiny) key corpus, not by
  * the corpus itself. The same bucketed-prefix layout story the batch ANN
  * docs tell, applied to streaming state.
  *
  * The index records EVERY arrival's keys — kept and dropped alike — which
  * is what makes the declared dedup policy ("similar to any earlier
  * arrival, kept or not, drops you") hold transitively across epochs: a doc
  * similar only to a previously-dropped doc still collapses to the chain's
  * first arrival, even though the dropped doc never landed in the table.
  *
  * Crash/replay protocol (exactly-once alignment with the sink's
  * [[graft.sink.CommitLog]]): the index for epoch e is appended AFTER the
  * epoch's data commit, with epoch-scoped file names published by rename.
  * A crash between data commit and index append leaves the epoch
  * unacknowledged in the streaming checkpoint, so the batch replays:
  * dedup recomputes against epochs ≠ e (readers exclude the current epoch's
  * own files, so a half-written previous attempt can never make a batch
  * collide with itself), the data write is discarded as a replay, and the
  * index append re-publishes idempotently (stale attempt files for the
  * epoch are removed first).
  */
object BandIndex {

  /** Bucket fan-out. 64 keeps per-bucket file counts readable at test
    * scale; a 100 TB ingest raises this (it is a layout constant of the
    * table, fixed at creation) so each epoch's read stays a few files —
    * the per-epoch read scales with batch key spread, never corpus size.
    */
  val NumBuckets = 64

  val DirName = "_banddex"

  private val PartName = "epoch-(-?\\d+)-\\d+\\.parquet".r

  /** Epoch id under which [[backfill]] publishes pre-index keys. */
  val BackfillEpoch: Long = -1L

  def dir(tableDir: String): String = s"$tableDir/$DirName"

  def bucket(bk: Column): Column = pmod(bk, lit(NumBuckets.toLong)).cast("int")

  private def fsFor(spark: SparkSession, tableDir: String): FileSystem =
    new Path(dir(tableDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Index files covering `touched` buckets from every epoch except
    * `excludeEpoch` — the complete per-epoch read set, listed driver-side
    * (O(|touched|) directory listings, metadata-scale like the manifest
    * reads the sink already does per epoch).
    */
  private[graft] def selectFiles(fs: FileSystem, tableDir: String,
      touched: Set[Int], excludeEpoch: Long): Seq[String] = {
    val idxDir = new Path(dir(tableDir))
    if (!fs.exists(idxDir)) return Seq.empty
    touched.toSeq.sorted.flatMap { b =>
      val bdir = new Path(idxDir, s"bucket=$b")
      if (!fs.exists(bdir)) Seq.empty
      else fs.listStatus(bdir).toSeq
        .filter(_.getPath.getName match {
          case PartName(id) => id.toLong != excludeEpoch
          case _ => false
        })
        .map(_.getPath.toString)
    }
  }

  /** All previously indexed band keys that could collide with a batch
    * whose keys hash into `touched` — a one-column (bk: long) frame.
    */
  def readKeys(spark: SparkSession, tableDir: String,
      touched: Set[Int], excludeEpoch: Long): DataFrame = {
    val files = selectFiles(fsFor(spark, tableDir), tableDir, touched, excludeEpoch)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("bk", LongType))))
    else
      // explicit schema: these are leaf files, and the bucket value lives in
      // the directory name — partition inference must not resurrect it
      spark.read.schema("bk LONG").parquet(files: _*)
  }

  /** The crash-safety-critical publish step shared by [[append]] and
    * [[compact]]: move each bucket's part files from the writer's tmp dir
    * into the live layout under epoch-scoped names (readers match only the
    * final names, so a crash mid-loop leaves a retryable partial that the
    * next attempt supersedes), then drop the tmp dir.
    */
  private def publishBuckets(
      fs: FileSystem, idxDir: Path, tmp: Path, id: Long): Unit = {
    fs.listStatus(tmp).filter(_.getPath.getName.startsWith("bucket="))
      .foreach { bdir =>
        val target = new Path(idxDir, bdir.getPath.getName)
        fs.mkdirs(target)
        fs.listStatus(bdir.getPath).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).zipWithIndex
          .foreach { case (p, i) =>
            fs.rename(p, new Path(target, s"epoch-$id-$i.parquet"))
          }
      }
    fs.delete(tmp, true)
  }

  /** Publish `keys` (doc_id, bk) as epoch `epochId`'s index files.
    * Idempotent: a replay removes the epoch's previous files first, and
    * per-bucket part files land under epoch-scoped names via rename, so a
    * crashed attempt is invisible to readers (they match only the final
    * names) and fully superseded on retry.
    */
  def append(keys: DataFrame, tableDir: String, epochId: Long): Unit = {
    val spark = keys.sparkSession
    val fs = fsFor(spark, tableDir)
    val idxDir = new Path(dir(tableDir))
    val tmp = new Path(idxDir, s".epoch-$epochId.tmp-${UUID.randomUUID}")
    // one file per populated bucket: the repartition clusters each bucket
    // into a single task before the partitioned write
    keys.select(col("bk"), bucket(col("bk")).as("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(tmp.toString)
    // drop any files a previous crashed attempt of THIS epoch published
    if (fs.exists(idxDir)) {
      fs.listStatus(idxDir).filter(_.getPath.getName.startsWith("bucket="))
        .foreach { bdir =>
          fs.listStatus(bdir.getPath)
            .filter(_.getPath.getName match {
              case PartName(id) => id.toLong == epochId
              case _ => false
            })
            .foreach(st => fs.delete(st.getPath, false))
        }
    }
    publishBuckets(fs, idxDir, tmp, epochId)
  }

  /** Consolidate the index's accumulated per-epoch files into ONE
    * deduplicated file per bucket. A long-running ingest writes a file per
    * (epoch, touched bucket), so after E epochs a bucket probe opens O(E)
    * small files — compaction restores O(1) files per bucket, and the
    * distinct() shrinks the keys to the set the semi-join actually needs.
    *
    * Designed to run SERIALLY with the writer — [[StreamingNearDedup]]
    * calls it inside foreachBatch every `compactEvery` epochs, where the
    * stream thread is the index's only reader and writer, so no concurrent
    * probe can observe the swap. `protectEpoch` (the in-flight epoch)
    * keeps that epoch's files out of the consolidation so the readers'
    * exclude-own-epoch replay guarantee stays exact: a consolidated file
    * only ever holds keys of epochs a replay must still see.
    *
    * The consolidated files are published under a fresh NEGATIVE epoch id
    * (one below the smallest id present, -2 at the earliest — [[BackfillEpoch]]
    * is -1), which positive streaming epochs can never collide with and
    * `excludeEpoch` never hides. Crash-safe: consolidated files are
    * rename-published BEFORE the consumed files are deleted, and duplicate
    * keys during the swap window are harmless to a left-semi probe.
    *
    * Cost model: each compaction rewrites the whole index — O(total keys),
    * a distributed job over 8-byte keys, i.e. ~10⁻⁴ of corpus bytes
    * (64 B of key per ~4 KB document), so even against a 100 TB corpus the
    * rewrite touches tens of GB every `compactEvery` epochs. `graft.DedupBench`
    * measures the resulting per-epoch profile: flat probe epochs with a
    * visible constant bump on compaction epochs (late/early ratio ≤ 1 as
    * the corpus grows 16×). If the rewrite ever mattered, the refinement is
    * tiered (LSM-style) merging of small files only — the layout already
    * supports it (any fresh negative id per merged tier).
    */
  def compact(spark: SparkSession, tableDir: String,
      protectEpoch: Long = Long.MinValue): Unit = {
    val fs = fsFor(spark, tableDir)
    val idxDir = new Path(dir(tableDir))
    if (!fs.exists(idxDir)) return
    val byBucket = fs.listStatus(idxDir)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .map { bdir =>
        bdir.getPath -> fs.listStatus(bdir.getPath).map(_.getPath)
          .flatMap(p => p.getName match {
            case PartName(id) if id.toLong != protectEpoch => Some(id.toLong -> p)
            case _ => None
          })
      }
    val consumed = byBucket.flatMap(_._2)
    // nothing to gain unless some bucket holds more than one file
    if (!byBucket.exists(_._2.length > 1)) return
    val cid = math.min(consumed.map(_._1).min, -1L) - 1L
    val tmp = new Path(idxDir, s".compact.tmp-${UUID.randomUUID}")
    spark.read.schema("bk LONG").parquet(consumed.map(_._2.toString): _*)
      .distinct()
      .select(col("bk"), bucket(col("bk")).as("bucket"))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(tmp.toString)
    publishBuckets(fs, idxDir, tmp, cid)
    consumed.foreach { case (_, p) => fs.delete(p, false) }
  }

  /** One-off upgrade path for a table written before the index existed:
    * derive band keys from the committed rows' band columns and publish
    * them under [[BackfillEpoch]]. Only LANDED docs can be recovered — the
    * pre-index design never recorded dropped arrivals — so chains through
    * docs dropped before the backfill stay collapsed only as far as the
    * table recorded them.
    */
  def backfill(spark: SparkSession, tableDir: String): Unit = {
    val existing = graft.sink.CommitLog.readCommitted(spark, tableDir)
    if (existing.columns.contains("band_0"))
      append(StreamingNearDedup.bandKeys(existing), tableDir, BackfillEpoch)
  }

  /** Heal a pre-index table before its first probe: a banded table with
    * committed rows but no index directory would silently probe an EMPTY
    * key set — every near-dup of the old corpus would re-land.
    * [[StreamingNearDedup]] calls this each epoch; after the first heal
    * (or on any post-index table) it is a single fs.exists.
    */
  def ensureBackfilled(spark: SparkSession, tableDir: String): Unit = {
    val fs = fsFor(spark, tableDir)
    if (!fs.exists(new Path(dir(tableDir)))) backfill(spark, tableDir)
  }
}
