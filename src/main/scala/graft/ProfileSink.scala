package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Throwaway single-thread profiler for the parquet landing write path —
  * isolates per-file open cost (conf copy + writer build) from per-row
  * write cost, against the JSONL encoder baseline, on the SinkBench row
  * shape. Delete after the round-11 measurement is recorded.
  */
object ProfileSink {
  def main(args: Array[String]): Unit = {
    val n = 1000000
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("user", StringType),
      StructField("msg", StringType)))
    val proj = UnsafeProjection.create(schema)
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) {
      rows(i) = proj(InternalRow(
        i.toLong, UTF8String.fromString(s"user-${i % 9973}"),
        UTF8String.fromString(s"msg payload for row $i with some width"))).copy()
      i += 1
    }
    val conf = new Configuration()
    val tmp = java.nio.file.Files.createTempDirectory("profsink").toString

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warm-up JIT
    {
      val enc = new graft.sink.JsonRowEncoder(schema, Seq(0, 1, 2))
      val sb = new StringBuilder(1 << 16)
      var j = 0
      while (j < 100000) { enc.encode(rows(j), sb); if (sb.length > 60000) sb.clear(); j += 1 }
      val w = graft.sink.ParquetIO.createWriter(new Path(s"$tmp/warm.parquet"), schema, conf)
      j = 0
      while (j < 100000) { w.write(rows(j)); j += 1 }
      w.close()
    }

    time("jsonl encode 1M (no io)") {
      val enc = new graft.sink.JsonRowEncoder(schema, Seq(0, 1, 2))
      val sb = new StringBuilder(1 << 16)
      var j = 0
      while (j < n) { enc.encode(rows(j), sb); if (sb.length > 60000) sb.clear(); j += 1 }
    }

    time("pinnedConf x88") {
      var j = 0
      while (j < 88) { graft.sink.ParquetIO.pinnedWriterConf(conf, schema); j += 1 }
    }

    time("parquet 1M, 88 files (bench shape)") {
      var j = 0
      var f = 0
      while (j < n) {
        val w = graft.sink.ParquetIO.createWriter(new Path(s"$tmp/a$f.parquet"), schema, conf)
        val end = math.min(j + 11364, n)
        while (j < end) { w.write(rows(j)); j += 1 }
        w.close(); f += 1
      }
    }

    time("parquet 1M, 1 file") {
      val w = graft.sink.ParquetIO.createWriter(new Path(s"$tmp/one.parquet"), schema, conf)
      var j = 0
      while (j < n) { w.write(rows(j)); j += 1 }
      w.close()
    }

    // per-open cost: open+close 88 empty writers
    time("open/close x88 (empty)") {
      var f = 0
      while (f < 88) {
        val w = graft.sink.ParquetIO.createWriter(new Path(s"$tmp/e$f.parquet"), schema, conf)
        w.close(); f += 1
      }
    }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}
