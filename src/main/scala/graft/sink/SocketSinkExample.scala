package graft.sink

import org.apache.spark.sql.SparkSession

/** Runnable example: socket source → typed parse → partitioned sink — the
  * rebuild of the reference's primary example
  * (`HiveStreamingExample.scala:63-86`: socket lines `id,msg,continent,
  * country` parsed with a typed map + arity assert, selectExpr projection,
  * partitioned destination, checkpointing, awaitTermination).
  *
  * Usage: start a line server first (e.g. `nc -lk 9999`, then type
  * `1,hello,Europe,France`), then: runMain graft.sink.SocketSinkExample
  * [host] [port] [outputDir]
  */
object SocketSinkExample {
  def main(args: Array[String]): Unit = {
    val host = args.headOption.getOrElse("localhost")
    val port = args.lift(1).getOrElse("9999")
    val dir = args.lift(2).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-socket-example").toString)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val lines = spark.readStream
      .format("socket")
      .option("host", host).option("port", port)
      .load()

    // typed parse with arity assert (reference HiveStreamingExample.scala:67-73)
    val alerts = lines.as[String].map { line =>
      val parts = line.split(",")
      assert(parts.length == 4)
      (parts(0).toInt, parts(1), parts(2), parts(3))
    }.selectExpr("_1 AS id", "_2 AS msg", "_3 AS continent", "_4 AS country")

    val query = alerts.writeStream
      .format("graft-streaming")
      .option("path", dir)
      .option("db", "streaming")
      .option("table", "alerts")
      .option("partition.columns", "continent,country")
      .option("checkpointLocation", s"$dir/_checkpoint")
      .start()

    println(s"[socket-sink-example] writing to $dir/streaming.alerts — Ctrl-C to stop")
    query.awaitTermination()
  }
}
