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
    */
  def commit(epochId: Long, files: Seq[String]): Boolean = {
    val f = fs
    f.mkdirs(commitsDir)
    val target = manifestPath(epochId)
    if (f.exists(target)) return false
    val tmp = new Path(commitsDir, s".epoch-$epochId.${java.util.UUID.randomUUID}.tmp")
    val out = f.create(tmp, false)
    try out.write(files.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // rename is the atomicity point; if a concurrent/replayed commit won the
    // race, discard ours
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      false
    } else true
  }

  /** All files published across all committed epochs. */
  def committedFiles(): Seq[String] = {
    val f = fs
    if (!f.exists(commitsDir)) return Seq.empty
    val manifests = f.listStatus(commitsDir).toSeq
      .filter(st => st.getPath.getName.startsWith("epoch-"))
    val out = mutable.ArrayBuffer.empty[String]
    manifests.foreach { st =>
      val in = f.open(st.getPath)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        new String(bytes.toByteArray, StandardCharsets.UTF_8)
          .split("\n").filter(_.nonEmpty).foreach(out += _)
      } finally in.close()
    }
    out.toSeq
  }

  def committedEpochs(): Seq[Long] = {
    val f = fs
    if (!f.exists(commitsDir)) return Seq.empty
    f.listStatus(commitsDir).toSeq.map(_.getPath.getName)
      .collect { case CommitLog.ManifestName(id) => id.toLong }
      .sorted
  }

  /** Delete the given files (replayed-epoch discard / task abort). */
  def deleteFiles(files: Seq[String]): Unit = {
    val f = fs
    files.foreach(p => f.delete(new Path(p), false))
  }
}

object CommitLog {
  val COMMITS_DIR = "_commits"
  private val ManifestName = "epoch-(-?\\d+)\\.manifest".r

  /** Read the committed rows of a graft-streaming table back as one JSON-lines
    * DataFrame (visibility strictly through manifests). Partition columns —
    * routed into `col=value/` directory names at write time, Hive-style —
    * are restored from the file paths.
    */
  def readCommitted(
      spark: org.apache.spark.sql.SparkSession,
      tableDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{input_file_name, regexp_extract}
    val log = new CommitLog(tableDir, spark.sparkContext.hadoopConfiguration)
    val files = log.committedFiles()
    if (files.isEmpty) return spark.emptyDataFrame
    // partition column names from the directory structure (k=v segments)
    val partCols = files.flatMap { f =>
      f.split('/').dropRight(1).filter(_.contains('='))
        .map(_.split("=", 2)(0))
    }.distinct
    val base = spark.read.json(files: _*)
    partCols.foldLeft(base) { (df, c) =>
      df.withColumn(c, regexp_extract(input_file_name(), s"/$c=([^/]+)/", 1))
    }
  }
}
