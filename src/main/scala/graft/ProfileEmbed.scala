package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Hyperplanes}

/** Throwaway stage profiler for q_dedup_embed (round-10 item #6). */
object ProfileEmbed {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      f // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = samples.map(_._1).sorted.apply(1)
      println(f"[profile] $label%-28s $med%8.3f s  rows=${samples.head._2}")
    }
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    val e = vecs.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    time("scan+cast") { e.count() }
    time("scan+nrm (1 dot)") {
      e.select(Hyperplanes.dot64(col("v"), col("v"))).count()
    }
    time("sigs only (no explode)") {
      e.select(Hyperplanes.bandKeys(col("v")).as("bk")).count()
    }
    val keys = e.select(col("vec_id").as("doc_id"),
      posexplode(Hyperplanes.bandKeys(col("v"))).as(Seq("band", "bkey")))
    time("keys (64-dot sigs)") { keys.count() }
    println("[profile] === keys codegen plan ===")
    keys.explain("codegen")
    time("bucketPairs") {
      Dedup.bucketPairs(keys, Seq("band", "bkey"), cap = 100).count()
    }
    time("full query") { Dedup.embedCosine(spark, dir).count() }
    spark.stop()
  }
}
