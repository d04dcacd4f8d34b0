package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Window-function operator surface (SURVEY.md §2.C q_window_rank,
  * q_window_frame, q_topk_pergroup, q_batch_split). One shuffle on the
  * partition key per window spec; specs sharing (partitionBy, orderBy) reuse
  * the same sort/exchange.
  */
object Windows {

  /** rank / dense_rank / row_number per group, top 20 per group. Orders
    * carry a unique o_orderkey tiebreak so every window function is
    * deterministic across engines.
    *
    * Two-level: `o_orderpriority` has a handful of values, so a direct
    * `partitionBy(o_orderpriority)` window funnels the whole fact table
    * through ~5 reducer partitions — the same low-cardinality-domain skew
    * the sequence packer removes (SCALE.md). Level 1 takes each input
    * split's local top-20 per priority (the window key includes
    * `spark_partition_id()`, so partitions stay balanced for ANY split
    * assignment); level 2 ranks the ≤ 20·splits survivors per priority.
    * Exactly result-preserving: the ordering is total (unique tiebreak),
    * every global top-20 row is inside its split's top-20, and each kept
    * row's rank counts only rows ordered before it — all of which are
    * kept.
    */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    def ordering = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val wLocal = Window.partitionBy("o_orderpriority", "pid")
      .orderBy(ordering: _*)
    val pruned = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= 20)
    val w = Window.partitionBy("o_orderpriority").orderBy(ordering: _*)
    pruned
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 20)
      .orderBy("o_orderpriority", "rn")
  }

  /** Running sum + lag/lead with an explicit rowsBetween frame, per user over
    * event time.
    */
  def windowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        Norm.r2(sum("value").over(frame)).as("running_value"),
        Norm.r2(lag("value", 1).over(w)).as("prev_value"),
        Norm.r2(lead("value", 1).over(w)).as("next_value"))
      .orderBy("event_id")
  }

  /** Top-k rows per group via row_number ≤ k — the scalable formulation (one
    * shuffle + per-partition sort; no global sort, no collect).
    */
  def topKPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** The reference sink's `batch.size` row batching (HiveStreamDataWriter
    * .scala:102-105, default 10000 — HiveOptions.scala:34) re-expressed as a
    * query: batch no. = floor((row_number-1)/batch_size) within a partition
    * stream, then rows per (partition, batch).
    */
  def batchSplit(s: SparkSession, dir: String): DataFrame = {
    val batchSize = 1000
    // batch sizes depend ONLY on the per-flag row count: rank-based batch
    // assignment (the oracle's window formulation) always yields full
    // batches of batchSize plus one remainder, whatever the order. The
    // previous window implementation partitioned by l_returnflag — a
    // 3-value column, i.e. parallelism 3 and a full per-flag sort at ANY
    // corpus size. One aggregate + arithmetic expansion computes the
    // identical result with no window and no skew.
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        explode(sequence(lit(0L),
          floor((col("n") - 1) / batchSize.toDouble).cast("long"))).as("batch_id"))
      .select(col("l_returnflag"), col("batch_id"),
        least(lit(batchSize.toLong),
          col("n") - col("batch_id") * batchSize).as("rows_in_batch"))
      .orderBy("l_returnflag", "batch_id")
  }
}
