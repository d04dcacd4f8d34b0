package graft.sink

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Epoch-scoped commit log giving the sink EXACTLY-ONCE visibility — the
  * upgrade over the reference's deliberate no-op epoch commit
  * (`HiveStreamWriter.scala:39-41`, which makes replayed epochs duplicate
  * rows; at-least-once).
  *
  * Protocol:
  *  - tasks write data files under the table dir with epoch-unique names and
  *    report them in their [[org.apache.spark.sql.connector.write.WriterCommitMessage]];
  *  - the driver's `commit(epochId, msgs)` writes
  *    `<table>/_commits/epoch-<id>.manifest` (rename-atomic: temp + rename)
  *    listing exactly the committed files;
  *  - a REPLAYED epoch (manifest already present) deletes the replay's
  *    freshly-written files instead of publishing them — idempotent;
  *  - readers resolve visibility through the manifests only, so files from
  *    crashed/zombie tasks are never visible even before cleanup.
  *
  * All filesystem access goes through the Hadoop [[FileSystem]] API: on a
  * real cluster the same code runs against HDFS/S3A; locally it is file://.
  */
final class CommitLog(tableDir: String, conf: Configuration) {

  private val commitsDir = new Path(tableDir, CommitLog.COMMITS_DIR)
  private def fs: FileSystem = commitsDir.getFileSystem(conf)

  def manifestPath(epochId: Long): Path =
    new Path(commitsDir, s"epoch-$epochId.manifest")

  def isCommitted(epochId: Long): Boolean = fs.exists(manifestPath(epochId))

  /** Publish `files` for `epochId`. Returns true if this call committed,
    * false if the epoch was already committed (replay → caller must discard
    * the replayed files).
    *
    * A COMPACTION commit additionally carries the epochs it supersedes, the
    * streaming high-water mark they covered, and the tombstone CEILING
    * (header lines, `#`-prefixed) — its single rename atomically redirects
    * readers from the superseded manifests' files to the consolidated ones.
    * The ceiling is the compact transitive form of positive-epoch
    * tombstones: a single-writer stream always consumes a PREFIX of its
    * epochs, so "every streaming epoch ≤ c is consumed" replaces listing
    * each id — without it, the in-loop fold's supersedes list would grow
    * with every consumed epoch forever, and the per-commit tombstone guard
    * below (which parses every negative manifest) would cost O(total
    * epochs) per epoch over an unbounded ingest.
    */
  def commit(
      epochId: Long, files: Seq[String],
      supersedes: Seq[Long] = Seq.empty,
      watermark: Option[Long] = None,
      tombstoneCeiling: Option[Long] = None,
      fileStats: Map[String, String] = Map.empty): Boolean = {
    val f = fs
    f.mkdirs(commitsDir)
    val target = manifestPath(epochId)
    if (f.exists(target)) return false
    // A tombstoned id was consumed by a compaction: publishing it again
    // would return success while manifests() filters the epoch forever —
    // silent data loss for a fresh-checkpoint lineage that restarts epoch
    // numbering at 0 on an already-compacted table. Fail loudly instead.
    // Negative (compaction) ids are exempt: Compact's retry loop probes ids
    // and relies on the false/true contract, and its nanoTime-derived ids
    // never repeat within a lineage.
    // the guard runs EVERY epoch commit, so it must open only the (few,
    // ladder-bounded) negative manifests — ceilings and supersedes lists
    // never appear on streaming manifests
    val negs = if (epochId >= 0) negativeManifests() else Seq.empty
    if (epochId >= 0 &&
        (epochId <= ceilingOf(negs) ||
          negs.flatMap(_.supersedes).contains(epochId)))
      throw new IllegalStateException(
        s"Epoch $epochId of $tableDir was compacted away (tombstoned): " +
          "committing it again would publish rows that stay permanently " +
          "invisible. Restart the query against a fresh table or fresh " +
          "epoch range, or compact only epochs every writer has passed.")
    val tmp = new Path(commitsDir, s".epoch-$epochId.${java.util.UUID.randomUUID}.tmp")
    val header =
      (if (supersedes.nonEmpty) Seq(s"#supersedes:${supersedes.mkString(",")}")
       else Seq.empty) ++
      watermark.map(w => s"#watermark:$w") ++
      tombstoneCeiling.map(c => s"#tombstone_ceiling:$c")
    // a file line optionally carries its serialized column stats after a
    // tab ([[FileStats]] — plan-time file skipping); paths can never
    // contain tabs (writer-generated names, control chars percent-encoded
    // in partition values), so the split is unambiguous, and readers that
    // predate stats simply took the whole line as the path
    val lines = files.map(f =>
      fileStats.get(f).filter(_.nonEmpty).map(s => s"$f\t$s").getOrElse(f))
    val out = f.create(tmp, false)
    try out.write((header ++ lines).mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename is the atomicity point. HDFS/S3A rename fails onto an existing
    // target; RawLocalFileSystem REPLACES it (POSIX), so re-check right
    // before renaming — Spark serializes epoch commits through one driver,
    // making the remaining window unreachable in practice.
    if (f.exists(target) || !f.rename(tmp, target)) {
      f.delete(tmp, false)
      false
    } else true
  }

  /** One parsed manifest: its data files, the epochs it supersedes
    * (compaction), the streaming watermark it preserves, the positive-
    * epoch tombstone ceiling it carries forward, and per-file column
    * statistics for plan-time skipping (absent for JSONL files and for
    * manifests written before stats existed).
    */
  case class Manifest(epochId: Long, files: Seq[String],
      supersedes: Seq[Long], watermark: Option[Long],
      tombstoneCeiling: Option[Long] = None,
      fileStats: Map[String, FileStats] = Map.empty)

  /** Max positive-epoch tombstone ceiling across the given manifests:
    * every streaming epoch ≤ this is consumed (Long.MinValue when none).
    */
  private def ceilingOf(ms: Seq[Manifest]): Long =
    ms.flatMap(_.tombstoneCeiling).foldLeft(Long.MinValue)(math.max)

  private def readManifest(epochId: Long, p: Path): Option[Manifest] = {
    val text =
      try CommitLog.readFully(fs, p)
      catch {
        // deleted by concurrent compaction cleanup between list and open —
        // by then its superseding manifest is already visible
        case _: java.io.FileNotFoundException => return None
      }
    val lines = text.split("\n").filter(_.nonEmpty).toSeq
    val supersedes = lines.collectFirst {
      case l if l.startsWith("#supersedes:") =>
        l.stripPrefix("#supersedes:").split(",").filter(_.nonEmpty).map(_.toLong).toSeq
    }.getOrElse(Seq.empty)
    val watermark = lines.collectFirst {
      case l if l.startsWith("#watermark:") => l.stripPrefix("#watermark:").toLong
    }
    val ceiling = lines.collectFirst {
      case l if l.startsWith("#tombstone_ceiling:") =>
        l.stripPrefix("#tombstone_ceiling:").toLong
    }
    val fileLines = lines.filterNot(_.startsWith("#"))
    val files = fileLines.map(_.takeWhile(_ != '\t'))
    val stats = fileLines.flatMap { l =>
      val toks = l.split('\t')
      if (toks.length < 2) None
      else FileStats.parse(toks.drop(1).toSeq).map(toks(0) -> _)
    }.toMap
    Some(Manifest(epochId, files, supersedes, watermark, ceiling, stats))
  }

  /** Every readable manifest, superseded ones included. */
  def allManifests(): Seq[Manifest] = {
    val f = fs
    if (!f.exists(commitsDir)) return Seq.empty
    f.listStatus(commitsDir).toSeq
      .flatMap { st =>
        st.getPath.getName match {
          case CommitLog.ManifestName(id) => readManifest(id.toLong, st.getPath)
          case _ => None
        }
      }
  }

  /** The parsed negative (compaction/batch) manifests only — the files
    * that can carry `#supersedes:` / `#tombstone_ceiling:`. Opens just
    * those few (tier-ladder-bounded) files; per-epoch callers must use
    * this, never a full allManifests() parse.
    */
  private def negativeManifests(): Seq[Manifest] = {
    val f = fs
    if (!f.exists(commitsDir)) return Seq.empty
    f.listStatus(commitsDir).toSeq.map(_.getPath.getName)
      .collect { case CommitLog.ManifestName(id) if id.toLong < 0L => id.toLong }
      .flatMap(id => readManifest(id, manifestPath(id)))
  }

  /** Union of all explicit tombstone sets (direct supersedes ids; the
    * positive-epoch prefix is carried separately by the ceiling header).
    */
  def allTombstones(): Set[Long] =
    negativeManifests().flatMap(_.supersedes).toSet

  /** True if any non-streaming (negative-id: compaction or batch) manifest
    * exists — the tailing source uses this to deliver an initial snapshot
    * even when no streaming epoch was ever committed.
    */
  def hasNonStreamingManifests(): Boolean = {
    val f = fs
    f.exists(commitsDir) && f.listStatus(commitsDir).exists(st =>
      st.getPath.getName match {
        case CommitLog.ManifestName(id) => id.toLong < 0L
        case _ => false
      })
  }

  /** All live manifests, with compaction-superseded ones removed — by
    * explicit supersedes id, or (for streaming epochs) by falling under a
    * tombstone ceiling: a positive leftover ≤ some manifest's ceiling is a
    * consumed epoch whose cleanup crashed, and must stay dead.
    */
  def manifests(): Seq[Manifest] = {
    val all = allManifests()
    val superseded = all.flatMap(_.supersedes).toSet
    val ceiling = ceilingOf(all)
    all.filterNot(m => superseded.contains(m.epochId) ||
      (m.epochId >= 0 && m.epochId <= ceiling))
  }

  /** All files published across all live epochs. */
  def committedFiles(): Seq[String] = manifests().flatMap(_.files)

  /** Live files with their recorded column stats (None → never skip). */
  def committedFilesWithStats(): Seq[(String, Option[FileStats])] =
    manifests().flatMap(m => m.files.map(f => f -> m.fileStats.get(f)))

  /** Files published by one specific live epoch (empty if uncommitted or
    * compacted away).
    */
  def filesOf(epochId: Long): Seq[String] =
    manifests().find(_.epochId == epochId).map(_.files).getOrElse(Seq.empty)

  def committedEpochs(): Seq[Long] = manifests().map(_.epochId).sorted

  /** Streaming high-water mark: max live streaming epoch id, or the
    * watermark a compaction preserved when it consumed those manifests.
    *
    * Called once per trigger by the tailing source, so it must NOT read
    * every manifest: positive ids come from listStatus names alone; only
    * the (few) negative compaction/batch manifests are opened for their
    * watermark header.
    */
  def streamingWatermark(): Long = {
    val f = fs
    if (!f.exists(commitsDir)) return -1L
    val names = f.listStatus(commitsDir).toSeq.map(_.getPath.getName)
      .collect { case CommitLog.ManifestName(id) => id.toLong }
    val posMax = names.filter(_ >= 0L).foldLeft(-1L)(math.max)
    val negWatermarks = names.filter(_ < 0L).flatMap { id =>
      readManifest(id, manifestPath(id)).flatMap(_.watermark)
    }
    negWatermarks.foldLeft(posMax)(math.max)
  }

  /** Remove a superseded manifest (post-compaction cleanup — only safe
    * after the superseding manifest is visible).
    */
  def deleteManifest(epochId: Long): Unit =
    fs.delete(manifestPath(epochId), false)

  /** Remove a superseded manifest AND, first, everything it itself
    * superseded that is still on disk (a previous generation's crashed
    * cleanup). Descendants go before the manifest hiding them, so at no
    * point does a leftover lack a live hider — this is what lets
    * compaction list only its DIRECTLY consumed ids instead of carrying
    * the transitive closure forever: any chain of crashed cleanups is
    * retried to its full depth by whichever later compaction finally
    * consumes the top of the chain.
    */
  def deleteManifestTransitively(epochId: Long,
      visited: mutable.Set[Long] = mutable.Set.empty): Unit = {
    if (!visited.add(epochId)) return
    val p = manifestPath(epochId)
    if (!fs.exists(p)) return
    readManifest(epochId, p).foreach(
      _.supersedes.foreach(deleteManifestTransitively(_, visited)))
    deleteManifest(epochId)
  }

  /** Delete the given files (replayed-epoch discard / task abort). */
  def deleteFiles(files: Seq[String]): Unit = {
    val f = fs
    files.foreach { p =>
      f.delete(new Path(p), false)
      Bloom.deleteSidecar(f, p) // bloom sidecars ride their data file
    }
  }
}

object CommitLog {
  val COMMITS_DIR = "_commits"
  private val ManifestName = "epoch-(-?\\d+)\\.manifest".r

  /** Read a (small) file fully as UTF-8 — the one read loop shared by
    * manifest, trash-ledger, and lease readers, so EOF/charset/close
    * behavior can never drift between them.
    */
  private[graft] def readFully(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  /** `k=v` path segments strictly BELOW the table root — never the
    * warehouse base path, which may itself contain `k=v`-shaped directories.
    */
  def partitionSegments(file: String, dbTable: String): Seq[(String, String)] = {
    val segs = file.split('/')
    val idx = segs.lastIndexOf(dbTable)
    if (idx < 0) Seq.empty
    else segs.slice(idx + 1, segs.length - 1).filter(_.contains('='))
      .map { s => val Array(k, v) = s.split("=", 2); k -> v }.toSeq
  }

  /** Read the committed rows of a graft-streaming table back (visibility
    * strictly through manifests). Delegates to the DSv2 read path —
    * `spark.read.format("graft-streaming")` — so partition values round-trip
    * identically (typed, percent-unescaped, `__NULL__` → null) on both
    * documented read routes. `tableDir` must be `<path>/<db>.<table>` as
    * produced by [[GraftSinkOptions.tableDir]].
    */
  def readCommitted(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String): org.apache.spark.sql.DataFrame = {
    val log = new CommitLog(tableDir, spark.sparkContext.hadoopConfiguration)
    val norm = tableDir.stripSuffix("/")
    val slash = norm.lastIndexOf('/')
    val dbTable = norm.substring(slash + 1)
    val dot = dbTable.indexOf('.')
    require(dot > 0, s"table dir '$tableDir' is not <path>/<db>.<table>")
    val opts = GraftSinkOptions(
      path = norm.substring(0, slash),
      db = dbTable.substring(0, dot),
      table = dbTable.substring(dot + 1),
      partitionColumns = Seq.empty, batchSize = 1, txnPerBatch = 1,
      autoCreatePartitions = true)
    if (log.committedFiles().isEmpty) {
      // schema-typed empty frame when the table exists but holds no rows,
      // so .select/.filter on known columns still analyze
      return SchemaRegistry.load(opts)
        .map(schema => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
        .getOrElse(spark.emptyDataFrame)
    }
    spark.read.format("graft-streaming")
      .option(GraftSinkOptions.PATH, opts.path)
      .option(GraftSinkOptions.DB, opts.db)
      .option(GraftSinkOptions.TABLE, opts.table)
      .load()
  }
}
