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
      operators.Hyperplanes.vecClean(
        col("embedding").cast("array<double>")).as("v"))
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

    // === scale sweep (round-13: the flat-gap-at-scale measurement) ===
    // Independent deterministic pseudo-random 64-dim vectors (sin-hash per
    // (id, dim)) — NOT jittered copies of the fixture, which would add a
    // quadratically-growing population of genuine near-dups and measure
    // the workload change, not the pipeline. With independent vectors the
    // only growth term is random band-key collisions:
    // E[pairs] = C(n,2)·bands·2^-bits.
    println("[profile] === embed scale sweep (independent random corpus) ===")
    for (bits <- Seq(8, 16); mult <- Seq(1, 3, 10, 32)) {
      val n0 = 2000 * mult
      // fract(sin(a*12.9898 + b*78.233)*43758.5453): uniform-ish in [0,1),
      // decorrelated across both id and dim (plain sin(id*c) left adjacent
      // ids nearly parallel and measured the cap guard, not the pipeline)
      val scaled = spark.range(n0).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)), j => {
          val h = sin(col("id") * 12.9898 + j * 78.233) * 43758.5453
          (h - floor(h)) * 2.0 - 1.0
        }).as("embedding"))
      var n = 0L
      val q = () => {
        n = Dedup.embedCosineOn(scaled, numBands = 8, bitsPerBand = bits).count(); n }
      q() // warm
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); q(); (System.nanoTime() - t0) / 1e9 }
      println(f"[profile] bits=$bits%-2d scale x$mult%-3d vecs=$n0%-6d " +
        f"sec=${samples.sorted.apply(1)}%7.3f  pairs=$n%d  " +
        s"samples=${samples.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
