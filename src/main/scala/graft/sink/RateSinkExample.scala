package graft.sink

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Runnable example: rate source → select → graft-streaming sink, then read
  * the committed rows back — the rebuild of the reference's
  * `RateStreamingExample.scala:63-82` (rate source, 3 s processing-time
  * trigger, format short-name resolution, checkpointing) with the commit-log
  * read-back replacing a Hive-side `SELECT`.
  *
  * Usage: runMain graft.sink.RateSinkExample [outputDir] [seconds]
  */
object RateSinkExample {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-rate-example").toString)
    val runSecs = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val query = spark.readStream
      .format("rate").option("rowsPerSecond", "100").load()
      .selectExpr("value", "CAST(timestamp AS STRING) AS event_time",
        "CAST(value % 3 AS STRING) AS shard")
      .writeStream
      .format("graft-streaming")
      .option("path", dir)
      .option("db", "demo")
      .option("table", "rates")
      .option("partition.columns", "shard")
      .option("batch.size", "1000")
      .trigger(Trigger.ProcessingTime(1000))
      .option("checkpointLocation", s"$dir/_checkpoint")
      .start()

    Thread.sleep(runSecs * 1000L)
    query.stop()

    // read back through the DSv2 read path (manifest-gated visibility)
    val out = spark.read.format("graft-streaming")
      .option("path", dir).option("db", "demo").option("table", "rates")
      .load()
    val n = out.count()
    val epochs = new CommitLog(s"$dir/demo.rates",
      spark.sparkContext.hadoopConfiguration).committedEpochs()
    println(s"[rate-sink-example] committed rows=$n epochs=${epochs.size} dir=$dir")
    out.orderBy("value").show(5, truncate = false)
    spark.stop()
  }
}
