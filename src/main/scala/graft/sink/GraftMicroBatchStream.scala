package graft.sink

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Streaming SOURCE over a graft-streaming table: tail the epoch commit log
  * — `spark.readStream.format("graft-streaming")` — turning the sink's
  * destination into a replayable, exactly-once relay stage (write pipeline A
  * → table → read pipeline B), a capability the write-only reference
  * delegates entirely to Hive.
  *
  * Offset = high-water mark over committed STREAMING epoch ids (monotonic
  * for a single writing query; negative batch pseudo-epochs are served to
  * batch reads but excluded from tailing so the offset order is total).
  * Each micro-batch reads exactly the files of the epochs in
  * `(start, end]`, so a restarted reader resumes from its checkpoint
  * without loss or duplication — the source inherits the sink's
  * exactly-once guarantee.
  */
final class GraftMicroBatchStream(
    requiredSchema: StructType,
    opts: GraftSinkOptions,
    conf: SerializableHadoopConf)
  extends MicroBatchStream {

  private def log = new CommitLog(opts.tableDir, conf.value)

  // monotonic even across compaction: a compaction manifest preserves the
  // streaming watermark of the epochs it consumed
  private def hwm(): Long = log.streamingWatermark()

  override def initialOffset(): Offset = GraftStreamOffset(-1L)

  override def latestOffset(): Offset = GraftStreamOffset(hwm())

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].maxEpoch
    val e = end.asInstanceOf[GraftStreamOffset].maxEpoch
    val epochs = log.committedEpochs().filter(id => id > s && id <= e && id >= 0L)
    epochs.flatMap { id =>
      log.filesOf(id).map { f =>
        GraftInputPartition(f,
          CommitLog.partitionSegments(f, s"${opts.db}.${opts.table}").toMap)
          : InputPartition
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftReaderFactory(requiredSchema, conf)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

final case class GraftStreamOffset(maxEpoch: Long) extends Offset {
  override def json(): String = maxEpoch.toString
}
