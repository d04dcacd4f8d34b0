package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Multimodal-column plumbing (north-star component): media payloads as
  * opaque `binary` columns with typed metadata, decoded/feature-extracted in
  * batched per-partition passes. The real-media decode (image/audio libs)
  * is stubbed behind [[FakeDecoder]] — deterministic so results are
  * oracle-checkable — but the Spark-side shape (schema, binary column,
  * partition-batched iteration, typed output) is the production path: swap
  * the decoder body for JNI/opencv and nothing else changes.
  */
object Multimodal {

  /** Raw media record: payload is an opaque byte blob + metadata struct. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], lang: String,
    source: String)

  /** Decoded features — what an image decode would yield. */
  case class DecodedRow(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    frames: Int, lang: String)

  /** Deterministic stand-in for the media decoder (the container has no
    * image/audio libs). Derives fake dimensions from payload length only —
    * byte-identical to the SQL oracle's arithmetic.
    */
  object FakeDecoder {
    def decode(r: MediaRow): DecodedRow = {
      val n = r.payload.length
      DecodedRow(r.doc_id, n, 64 + n % 640, 64 + n % 480, 1 + n % 16, r.lang)
    }
  }

  /** Text + vector modalities joined in one relation, aggregated per
    * (lang, label): the multimodal-stats query (SURVEY.md §2.C
    * q_multimodal_stats).
    */
  def stats(s: SparkSession, dir: String): DataFrame =
    statsOn(Tables.documents(s, dir), Tables.embeddings(s, dir))

  /** [[stats]] over arbitrary (doc_id, lang, n_chars) docs and
    * (vec_id, label, embedding) vectors.
    */
  def statsOn(docs: DataFrame, vecs: DataFrame): DataFrame = {
    val norm = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    docs
      .join(vecs, col("doc_id") === col("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("cnt"),
        Norm.r2(avg("n_chars")).as("avg_chars"),
        Norm.r4(avg(norm)).as("avg_norm"))
      .orderBy("lang", "label")
  }

  /** Binary-column decode pipeline, expression form: the FakeDecoder's
    * feature extraction is pure arithmetic on the payload length, so the
    * whole pipeline stays in Catalyst columns — fully codegen'd, no
    * encoder round-trip, column pruning reaches the scan. This is the query
    * registered with the driver; [[decodeBatched]] below keeps the
    * real-decoder plumbing.
    */
  def decodePipeline(s: SparkSession, dir: String): DataFrame =
    decodePipelineOn(Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("lang")))

  /** [[decodePipeline]] over an arbitrary (payload: binary, lang) frame —
    * the form real media tables (parquet binary columns) feed directly.
    */
  def decodePipelineOn(media: DataFrame): DataFrame =
    media
      .select(col("lang"), octet_length(col("payload")).as("n_bytes"))
      .select(col("lang"), col("n_bytes"),
        (lit(64) + col("n_bytes") % 640).as("width"),
        (lit(64) + col("n_bytes") % 480).as("height"))
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        Norm.r2(avg("width")).as("avg_width"),
        Norm.r2(avg("height")).as("avg_height"),
        max("n_bytes").as("max_bytes"))
      .orderBy("lang")

  /** Resize + frame-sample pipeline over the decoded features: videos
    * (payloads) expand to their frame sequence, every 4th frame is sampled
    * (uniform temporal subsampling), and each sampled frame is resized to
    * half resolution — the remaining multimodal verbs (resize,
    * frame-sample) as pure column arithmetic over the deterministic decode.
    * `explode(sequence(...))` is the generator shape a real frame extractor
    * feeds; at scale the explode happens map-side with no shuffle until the
    * final aggregate.
    */
  def framePipeline(s: SparkSession, dir: String, every: Int = 4): DataFrame =
    framePipelineOn(Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        col("text").cast("binary").as("payload")), every)

  /** [[framePipeline]] over an arbitrary (doc_id, lang, payload: binary)
    * frame.
    */
  def framePipelineOn(raw: DataFrame, every: Int = 4): DataFrame = {
    val media = raw
      .select(col("doc_id"), col("lang"),
        octet_length(col("payload")).as("n_bytes"))
      .withColumn("frames", lit(1) + col("n_bytes") % 16)
      .withColumn("width", lit(64) + col("n_bytes") % 640)
      .withColumn("height", lit(64) + col("n_bytes") % 480)
      // resize to half resolution, floor semantics in both engines
      .withColumn("rs_width", floor(col("width") / 2).cast("int"))
      .withColumn("rs_height", floor(col("height") / 2).cast("int"))
    media
      .select(col("doc_id"), col("lang"), col("rs_width"), col("rs_height"),
        explode(sequence(lit(0), col("frames") - 1)).as("frame_idx"))
      .filter(col("frame_idx") % every === 0)
      .groupBy("lang")
      .agg(count(lit(1)).as("sampled_frames"),
        countDistinct(col("doc_id")).as("docs"),
        Norm.r2(avg("rs_width")).as("avg_rs_width"),
        Norm.r2(avg("rs_height")).as("avg_rs_height"))
      .orderBy("lang")
  }

  /** Binary-column decode pipeline, batched-decoder form: typed
    * per-partition iteration (`mapPartitions` — the Scala analogue of
    * mapInPandas: ONE decoder instance per partition streaming over the
    * batch). This shape pays an encoder round-trip and breaks whole-stage
    * codegen, so it is reserved for decoders that genuinely need native
    * setup (JNI/model load) — swap [[FakeDecoder.decode]]'s body for the
    * real call and nothing else changes. The ScalaTest suite asserts it
    * agrees with [[decodePipeline]].
    */
  def decodeBatched(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeBatchedOn(Tables.documents(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        col("lang"), col("source"))
      .as[MediaRow])
  }

  /** [[decodeBatched]] over an arbitrary typed media dataset. */
  def decodeBatchedOn(media: org.apache.spark.sql.Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media
      // a NULL payload has nothing to decode — excluded before the typed
      // map (an unguarded decoder would NPE the task; the expression path
      // null-propagates instead, and a real decoder must pick its own
      // null policy here)
      .filter((r: MediaRow) => r.payload != null)
      .mapPartitions { batch =>
        // per-partition decoder setup would go here (model load, JNI init)
        batch.map(FakeDecoder.decode)
      }
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        Norm.r2(avg("width")).as("avg_width"),
        Norm.r2(avg("height")).as("avg_height"),
        max("n_bytes").as("max_bytes"))
      .orderBy("lang")
  }
}
