package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Text-analysis operators for training-data curation (north-star set:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting) plus the classic tokenize→explode→count word-count.
  * Everything is built-in-expression only (codegen'd); per-doc work is
  * whole-row higher-order functions, so the only shuffles are the final
  * aggregations.
  */
object Text {

  private val StopWords = Seq("the", "a", "of", "to", "in", "and", "is")

  /** Word count: tokenize → explode → stopword filter → count. */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0 && !col("token").isin(StopWords: _*))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(100)

  /** Language-ID heuristic: stopword-hit ratio against a tiny English
    * function-word profile (the n-gram-profile method degenerated to
    * unigrams — adequate for a deterministic, oracle-checkable heuristic).
    */
  def langId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("lang"), size(col("tk")).as("n_tokens"),
        size(filter(col("tk"), t => t.isin(StopWords: _*))).as("en_hits"))
      .withColumn("en_ratio", Norm.r4(col("en_hits") / col("n_tokens")))
      .withColumn("pred_en", col("en_ratio") >= 0.05)
      .orderBy("doc_id")

  /** Quality scoring: length, mean token length, stopword ratio,
    * type-token ratio, and a blended 0-1 quality score.
    */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"), split(col("text"), " ").as("tk"))
      .select(col("doc_id"), col("n_chars"),
        size(col("tk")).as("n_tokens"),
        Norm.r4((col("n_chars") - size(col("tk")) + 1) / size(col("tk")))
          .as("mean_tok_len"),
        Norm.r4(size(filter(col("tk"), t => t.isin(StopWords: _*))) /
          size(col("tk"))).as("stop_ratio"),
        Norm.r4(size(array_distinct(col("tk"))) / size(col("tk")))
          .as("ttr"))
      .withColumn("quality", Norm.r4(
        least(col("n_tokens") / 100.0, lit(1.0)) * 0.5 +
        col("ttr") * 0.3 + least(col("stop_ratio") * 4.0, lit(1.0)) * 0.2))
      .orderBy("doc_id")

  /** Token counting: whitespace tokens + a BPE-ish regex token count
    * (runs of ≤4 letters approximate subword pieces) + chars-per-token.
    */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]{1,4}")).as("bpe_tokens"),
        length(col("text")).as("n_chars"))
      .withColumn("chars_per_bpe",
        Norm.r4(col("n_chars") / col("bpe_tokens")))
      .orderBy("doc_id")

  /** Document fingerprint: md5 of the normalized text (cross-engine-stable
    * content address used for exact dedup at scale).
    */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(trim(lower(col("text")))).as("fingerprint"))
      .orderBy("doc_id")

  /** Rolling-hash (winnowing-style) fingerprint: min/max xxhash64 over
    * 5-gram shingles — Spark-internal hash, so rows-only driver check; the
    * ScalaTest spec asserts stability + collision behaviour.
    */
  def rollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    val n = 5
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("tk")) - n),
          i => xxhash64(concat_ws(" ",
            (0 until n).map(j => col("tk")(i + j)): _*))).as("hashes"))
      .select(col("doc_id"), array_min(col("hashes")).as("min_hash"),
        array_max(col("hashes")).as("max_hash"),
        size(col("hashes")).as("n_shingles"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test split assignment by content hash —
    * the standard reproducible-dataset-split mechanism (hash the content,
    * bucket the first hex byte: < 0xcc train ≈ 79.7 %, < 0xe6 val ≈ 10.2 %,
    * rest test). md5 is identical across engines, so the assignment is
    * portable and fully oracle-checked; being content-keyed, duplicate
    * texts always land in the SAME split (no train/test leakage).
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        substring(md5(col("text")), 1, 2).as("hb"))
      .withColumn("split",
        when(col("hb") < "cc", "train")
          .when(col("hb") < "e6", "val")
          .otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("docs"))
      .orderBy("lang", "split")
}
