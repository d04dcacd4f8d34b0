package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Small-file compaction for a graft-streaming table — the maintenance
  * operation every file-based streaming sink needs (the reference delegates
  * it to Hive ACID's compactor; reference tables are `transactional=true`
  * precisely so delta files get compacted server-side).
  *
  * Protocol (single atomic publish, lazy cleanup):
  *  1. read the live manifests and group their data files by partition
  *     directory;
  *  2. concatenate each group into one consolidated `.jsonl` file (JSON
  *     lines concatenate byte-for-byte — no parse/re-encode);
  *  3. commit ONE compaction manifest (negative pseudo-epoch) listing the
  *     consolidated files, carrying `#supersedes:` for every consumed
  *     manifest and `#watermark:` preserving the streaming high-water mark —
  *     the rename is the atomicity point: before it readers see the old
  *     manifests, after it the consolidated ones, never both;
  *  4. delete the superseded manifests and their files — safe because the
  *     compaction manifest is already visible, so a concurrent reader either
  *     lists them as superseded or no longer lists them at all.
  *
  * A streaming tail that has already passed the watermark is unaffected;
  * a tail restarting from an offset BELOW the watermark cannot replay the
  * compacted epochs individually (documented trade-off — compact only
  * ranges every consumer has passed, as with any log-compacted store).
  */
object Compact {

  case class Result(
      consolidatedFiles: Int, supersededEpochs: Int, removedFiles: Int)

  /** @param retainMillis how long superseded DATA files are retained after
    *                     compaction before a later run purges them — gives
    *                     in-flight readers that planned against the old
    *                     manifests time to finish (Delta's VACUUM retention
    *                     idea). Defaults to 10 minutes — comfortably longer
    *                     than a planned-but-running scan; concurrent readers
    *                     are an advertised capability, so immediate deletion
    *                     (0, which makes a mid-query reader hit
    *                     FileNotFoundException) is an explicit opt-in for
    *                     single-process use only.
    * @param lockStaleMillis age past which a crashed compactor's lock is
    *                        reclaimed; must exceed the longest expected
    *                        compaction.
    * @param protectEpoch manifest id to EXCLUDE from the consolidation.
    *                     A streaming writer folding compaction into its own
    *                     loop passes its in-flight epoch: that is the only
    *                     epoch a crash can replay, and replaying a
    *                     tombstoned epoch fails loudly by design — every
    *                     older streaming epoch is checkpoint-acknowledged
    *                     (epoch e only runs after e-1's ack) and can never
    *                     replay, so consuming those is safe.
    * @param deltasOnly   consolidate only the streaming DELTA manifests
    *                     (ids ≥ 0), leaving previous compaction results
    *                     untouched — an L0-style minor compaction whose
    *                     cost is bounded by the bytes ingested since the
    *                     last one, never the table size (the in-loop
    *                     posture; a full run every cycle would rewrite the
    *                     whole table — O(corpus) per cycle, the same
    *                     growing-cost pattern BandIndex's tiering removes).
    *                     Prior compaction manifests stay live and keep
    *                     their own tombstones, so no carry-forward is
    *                     needed; a periodic FULL run (deltasOnly = false)
    *                     folds the accumulated minor files together.
    */
  def run(tableDir: String, conf: Configuration,
      retainMillis: Long = 10 * 60 * 1000L,
      lockStaleMillis: Long = 30 * 60 * 1000L,
      protectEpoch: Long = Long.MinValue,
      deltasOnly: Boolean = false): Result = {
    val log = new CommitLog(tableDir, conf)
    val fs = new Path(tableDir).getFileSystem(conf)
    // one compactor at a time: exclusive-create lock. Stale-lock reclaim is
    // RENAME-based — rename succeeds for exactly one contender, so two
    // compactors can never both reclaim and run (delete-then-create would
    // let the loser delete the winner's fresh lock).
    val lock = new Path(tableDir, s"${CommitLog.COMMITS_DIR}/.compaction.lock")
    if (fs.exists(lock) &&
        System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
          > lockStaleMillis) {
      val claimed = new Path(lock.getParent,
        s".compaction.lock.stale-${java.util.UUID.randomUUID}")
      if (fs.rename(lock, claimed)) fs.delete(claimed, false)
    }
    try fs.create(lock, false).close()
    catch {
      case _: java.io.IOException =>
        throw new IllegalStateException(
          s"Another compaction holds $lock; concurrent compactions would " +
            "duplicate every row")
    }
    try doRun(log, fs, tableDir, retainMillis, protectEpoch, deltasOnly)
    finally fs.delete(lock, false)
  }

  private def doRun(
      log: CommitLog,
      fileSystem: org.apache.hadoop.fs.FileSystem,
      tableDir: String,
      retainMillis: Long,
      protectEpoch: Long,
      deltasOnly: Boolean): Result = {
    val fs = fileSystem
    purgeExpiredTrash(fs, tableDir, retainMillis)
    val live = log.manifests()
      .filter(m => m.epochId != protectEpoch &&
        (!deltasOnly || m.epochId >= 0))
    if (live.size <= 1) return Result(0, 0, 0)
    val oldFiles = live.flatMap(_.files)
    if (oldFiles.isEmpty) return Result(0, 0, 0)
    val raw = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    // consolidate per partition directory so routing stays intact
    val byDir = oldFiles.groupBy(f => new Path(f).getParent)
    val newFiles = byDir.map { case (dir, files) =>
      val target = new Path(dir,
        s"compact-${java.util.UUID.randomUUID.toString.take(8)}.jsonl")
      val out = raw.create(target, false)
      try {
        val buf = new Array[Byte](1 << 16)
        files.foreach { f =>
          val in = raw.open(new Path(f))
          try {
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        }
      } finally out.close()
      target.toString
    }.toSeq

    val watermark = log.streamingWatermark()
    // tombstones carry forward TRANSITIVELY: include every previously
    // superseded id so a crashed cleanup's leftover manifests can never be
    // resurrected once the manifest holding their tombstone is itself
    // compacted away. A deltas-only run leaves prior compaction manifests
    // (and the tombstones they hold) live, so it must NOT re-list them —
    // a listed id HIDES that manifest, and hiding a live compaction
    // manifest would drop its rows
    val tombstones =
      (live.map(_.epochId) ++
        (if (deltasOnly) Seq.empty else log.allTombstones())).distinct
    var epoch = -math.abs(System.nanoTime())
    while (!log.commit(epoch, newFiles,
        supersedes = tombstones,
        watermark = if (watermark >= 0) Some(watermark) else None)) {
      epoch -= 1
    }
    // lazy cleanup — the compaction manifest is visible, so NEW readers no
    // longer reference the superseded state. Manifests go now; data files
    // go now (retainMillis = 0) or into a trash ledger purged by a later
    // run, giving IN-FLIGHT readers that already planned against the old
    // file list time to finish.
    live.foreach(m => log.deleteManifest(m.epochId))
    if (retainMillis <= 0) log.deleteFiles(oldFiles)
    else {
      val trash = new Path(tableDir,
        s"${CommitLog.COMMITS_DIR}/.trash-${System.currentTimeMillis()}")
      val out = fs.create(trash, false)
      try out.write(oldFiles.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    Result(newFiles.size, live.size, oldFiles.size)
  }

  private def purgeExpiredTrash(
      fs: org.apache.hadoop.fs.FileSystem, tableDir: String,
      retainMillis: Long): Unit = {
    val commits = new Path(tableDir, CommitLog.COMMITS_DIR)
    if (!fs.exists(commits)) return
    val now = System.currentTimeMillis()
    fs.listStatus(commits).filter(_.getPath.getName.startsWith(".trash-"))
      .foreach { st =>
        val ts = st.getPath.getName.stripPrefix(".trash-").toLong
        if (now - ts > retainMillis) {
          val in = fs.open(st.getPath)
          val text = try {
            val bytes = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](8192)
            var n = in.read(buf)
            while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
            new String(bytes.toByteArray, "UTF-8")
          } finally in.close()
          text.split("\n").filter(_.nonEmpty)
            .foreach(f => fs.delete(new Path(f), false))
          fs.delete(st.getPath, false)
        }
      }
  }
}
