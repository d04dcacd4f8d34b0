package graft

/** Diagnostic main: execute the shuffle-heavy dedup/similarity queries under
  * the BENCH config (local[32], shuffle.partitions=32, AQE on — Spark 4
  * default) at sf0.1 and print each query's FINAL adaptive plan, so the
  * AQE behavior recorded in SCALE.md (§"AQE under the bench config") is
  * observed, not asserted. Collect() (results are tens of rows) forces
  * execution so AdaptiveSparkPlan reaches isFinalPlan=true and the
  * AQEShuffleRead nodes show their runtime-coalesced partition counts.
  */
object AqeAudit {

  /** Task-level shuffle byte totals, accumulated across a query's jobs so
    * SCALE.md can quote MEASURED shuffle volumes instead of qualitative
    * claims. Reset per query; reads are taken after a settle sleep since
    * the listener bus delivers task-end events asynchronously.
    */
  private class ShuffleBytes extends org.apache.spark.scheduler.SparkListener {
    val write = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(
        te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
    def reset(): Unit = { write.set(0); read.set(0) }
  }

  private def mb(bytes: Long): String = f"${bytes / 1048576.0}%.1f MiB"

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new ShuffleBytes
    spark.sparkContext.addSparkListener(bytes)
    println(s"adaptive.enabled=${spark.conf.get("spark.sql.adaptive.enabled")} " +
      s"coalescePartitions=${spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")} " +
      s"skewJoin=${spark.conf.get("spark.sql.adaptive.skewJoin.enabled")} " +
      s"advisoryPartitionSize=${spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")}")
    val interesting =
      Seq("q_dedup_ngram", "q_dedup_near", "q_dedup_simhash", "q_dedup_embed",
        "q_dedup_cluster", "q_sim_knn_join", "q_join_inner",
        "q_quality_repetition", "q_source_mix", "q_join_asof",
        "q_window_rank",
        // r15 additions: retention's two user/cohort exchanges, nearest
        // as-of's single exchange serving both carries, bigrams'
        // two-level agg, zscore's metadata-only stats shuffle
        "q_window_retention", "q_join_asof_nearest", "q_text_bigrams",
        "q_agg_zscore", "q_agg_corr",
        // r15 late additions: the salted join's replicated shuffle, the
        // sample's WindowGroupLimit-pruned exchange, the gap profile's
        // single user exchange, semantic clustering's log-round iteration
        "q_join_skew", "q_sample_group", "q_window_gap", "q_dedup_semantic",
        // r16 additions: quantization lines must shuffle nothing beyond
        // the contract sort; the LM score's token join + doc aggregate
        "q_embed_quantize", "q_embed_codes", "q_quality_lm")
    interesting.foreach { name =>
      bytes.reset()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.collect().length
      Thread.sleep(500) // let the async listener bus drain task-end events
      println(s"\n########## $name (rows=$n) shuffleWrite=${mb(bytes.write.get)} " +
        s"shuffleRead=${mb(bytes.read.get)}")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the full formatted plan is long; surface the AQE-relevant lines
      plan.linesIterator.filter(l =>
        l.contains("AdaptiveSparkPlan") || l.contains("AQEShuffleRead") ||
        l.contains("Exchange") || l.contains("Arguments: coalesced") ||
        l.contains("SortMergeJoin") || l.contains("BroadcastHashJoin"))
        .foreach(println)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
