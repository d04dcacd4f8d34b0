package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sink.CommitLog

/** Streaming ingestion with cross-epoch content dedup — the composition a
  * training-data pipeline runs: stream of documents → canonical
  * fingerprint → drop rows whose fingerprint already landed in ANY earlier
  * epoch → append survivors through the exactly-once sink.
  *
  * `foreachBatch` is the right tool (reference examples use the plain sink
  * path; this is the §2.C streaming-suite foreachBatch row doing real
  * work): the dedup state IS the destination table, so there is no separate
  * state store to size or checkpoint — the anti-join reads committed
  * fingerprints through the manifest-gated read path. At scale the
  * destination is bucketed by fingerprint, making the anti-join a
  * shuffle-free bucket join.
  */
object StreamingDedup {

  /** Canonical content fingerprint (matches `Text.fingerprint`). */
  def withFingerprint(docs: DataFrame): DataFrame =
    docs.withColumn("fp", md5(trim(lower(col("text")))))

  def start(
      docs: DataFrame,
      path: String, db: String, table: String,
      checkpoint: String): StreamingQuery = {
    val tableDir = s"$path/$db.$table"
    docs.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        val fresh = withFingerprint(batch).dropDuplicates("fp")
        val existing = CommitLog.readCommitted(spark, tableDir)
        val novel =
          if (existing.columns.contains("fp")) {
            fresh.join(existing.select("fp").distinct(), Seq("fp"), "left_anti")
          } else fresh
        // commit.epoch = the foreachBatch epoch: replays are idempotent and
        // the deduped rows stay visible to tailing readers of the table
        novel.write.format("graft-streaming").mode("append")
          .option("path", path).option("db", db).option("table", table)
          .option(graft.sink.GraftSinkOptions.COMMIT_EPOCH, epochId)
          .save()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
