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

  /** Little-endian byte decomposition as hex, for the fixture ENCODER:
    * `nBytes` bytes of `v`, least-significant first, each as 2 hex chars.
    * Pure `shiftright`/`bitwiseAND`/`hex` column arithmetic — deliberately
    * independent of the byte-level PARSER ([[graft.functions
    * .MediaHeaderParse]]), so an endianness or offset bug in either side
    * fails the oracle hash instead of cancelling out.
    */
  private def leHex(v: org.apache.spark.sql.Column, nBytes: Int) =
    concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(v, 8 * i).bitwiseAND(lit(255))), 2, "0")): _*)

  /** STRUCTURED media fixture over the documents table: each doc becomes a
    * GM01 container (see [[graft.functions.MediaHeaderParse]] for the
    * layout) — magic + version, channels byte, little-endian int32
    * width/height, little-endian uint16 frame count, then the text bytes
    * as the opaque body. Docs with `doc_id % 97 == 0` get a corrupted
    * magic ("XX"), so the parse side has real invalid inputs to detect.
    * Field values are arithmetic over (doc_id, n_chars) — NOT derivable
    * from the body length — which is what makes `q_multimodal_parse`
    * oracle-checkable: DuckDB recomputes the same arithmetic while Spark
    * must recover the values from the bytes it actually wrote.
    */
  def mediaFixture(docs: DataFrame): DataFrame = {
    val magicHex = when(col("doc_id") % 97 === 0, lit("585801"))
      .otherwise(lit("474D01"))
    val headerHex = concat(
      magicHex,
      lpad(hex(lit(1) + col("doc_id") % 4), 2, "0"),
      leHex(lit(64) + col("n_chars") % 640, 4),
      leHex(lit(64) + (col("n_chars") * 7) % 480, 4),
      leHex(lit(1) + col("n_chars") % 16, 2))
    docs.select(col("doc_id"), col("lang"),
      concat(unhex(headerHex), col("text").cast("binary")).as("payload"))
  }

  /** Binary header-PARSE pipeline (registry `q_multimodal_parse`): decode
    * the GM01 containers back out of the raw bytes — magic/version
    * validation plus little-endian field assembly in ONE codegen pass
    * ([[graft.functions.MediaHeaderParse]]) — and aggregate per-lang image
    * stats in the same job, corrupt payloads counted (not silently
    * dropped). This is the real multimodal decode shape: at 100 TB the
    * payload column is the dominant bytes and everything here is map-side
    * until the final k-group aggregate; only the scrub counters shuffle.
    */
  def parsePipeline(s: SparkSession, dir: String): DataFrame =
    parseOn(mediaFixture(Tables.documents(s, dir)))

  /** [[parsePipeline]] over an arbitrary (lang, payload: binary) frame —
    * the form a real media table (parquet binary column) feeds directly.
    */
  def parseOn(media: DataFrame): DataFrame = {
    val h = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MediaHeaderParse(
        org.apache.spark.sql.GraftSqlBridge.expression(col("payload"))))
    media
      .select(col("lang"), h.as("h"))
      .groupBy("lang")
      .agg(
        count(when(col("h.ok"), 1)).as("cnt_ok"),
        count(when(!col("h.ok"), 1)).as("cnt_bad"),
        Norm.r2(avg(when(col("h.ok"), col("h.width")))).as("avg_width"),
        Norm.r2(avg(when(col("h.ok"), col("h.height")))).as("avg_height"),
        sum(when(col("h.ok"), col("h.channels"))).as("sum_channels"),
        max(when(col("h.ok"), col("h.frames"))).as("max_frames"),
        sum(when(col("h.ok"), col("h.body_bytes"))).as("sum_body_bytes"))
      .orderBy("lang")
  }

  /** Body-level decode pipeline (registry `q_multimodal_body`, r19): after
    * the header validates, stream the opaque BODY bytes as unsigned 8-bit
    * samples at a fixed stride and aggregate per-lang amplitude stats —
    * the PCM/waveform feature-extract shape, one codegen pass per row
    * ([[graft.functions.MediaBodyStats]]), counters-only shuffle. The
    * oracle recomputes the same samples from the documents' text via
    * DuckDB `code_point` (the fixture body IS the text's ASCII bytes), so
    * Spark must recover the amplitudes from the bytes it actually wrote.
    */
  def bodyPipeline(s: SparkSession, dir: String): DataFrame =
    bodyOn(mediaFixture(Tables.documents(s, dir)))

  /** [[bodyPipeline]] over an arbitrary (lang, payload: binary) frame. */
  def bodyOn(media: DataFrame, stride: Int = 7): DataFrame = {
    val st = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.MediaBodyStats(
        org.apache.spark.sql.GraftSqlBridge.expression(col("payload")),
        stride))
    media
      .select(col("lang"), st.as("s"))
      .groupBy("lang")
      .agg(
        count(when(col("s.ok"), 1)).as("cnt_ok"),
        count(when(!col("s.ok"), 1)).as("cnt_bad"),
        sum(when(col("s.ok"), col("s.n_samples"))).as("n_samples"),
        Norm.r4(sum(when(col("s.ok"), col("s.sum_amp"))) /
          sum(when(col("s.ok"), col("s.n_samples")))).as("mean_amp"),
        max(when(col("s.ok"), col("s.max_amp"))).as("max_amp"))
      .orderBy("lang")
  }

  /** Parsed per-payload record, the batched parser's typed output. */
  case class ParsedRow(doc_id: Long, lang: String, ok: Boolean,
    channels: Int, width: Int, height: Int, frames: Int, body_bytes: Int)

  /** [[parseOn]]'s per-partition BATCHED form: the same GM01 parse through
    * `java.nio.ByteBuffer` little-endian reads inside `mapPartitions` —
    * the plumbing shape a real decoder (JNI/opencv/model handle) slots
    * into, paying the encoder round-trip the expression form avoids. One
    * parser "instance" per partition streams the batch; the suite asserts
    * its aggregate is identical to [[parseOn]]'s.
    */
  def parseBatched(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    val typed = media.select(col("doc_id"), col("lang"), col("payload"))
      .as[(Long, String, Array[Byte])]
    typed
      .filter((r: (Long, String, Array[Byte])) => r._3 != null)
      .mapPartitions { batch =>
        // per-partition decoder setup would go here (JNI init, model load)
        batch.map { case (id, lang, b) =>
          val ok = b.length >= 14 &&
            b(0) == 0x47.toByte && b(1) == 0x4D.toByte && b(2) == 0x01.toByte
          if (!ok) ParsedRow(id, lang, ok = false, 0, 0, 0, 0, 0)
          else {
            val buf = java.nio.ByteBuffer.wrap(b)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            ParsedRow(id, lang, ok = true,
              channels = b(3) & 0xFF,
              width = buf.getInt(4),
              height = buf.getInt(8),
              frames = buf.getShort(12) & 0xFFFF,
              body_bytes = b.length - 14)
          }
        }
      }
      .groupBy("lang")
      .agg(
        count(when(col("ok"), 1)).as("cnt_ok"),
        count(when(!col("ok"), 1)).as("cnt_bad"),
        Norm.r2(avg(when(col("ok"), col("width")))).as("avg_width"),
        Norm.r2(avg(when(col("ok"), col("height")))).as("avg_height"),
        sum(when(col("ok"), col("channels"))).as("sum_channels"),
        max(when(col("ok"), col("frames"))).as("max_frames"),
        sum(when(col("ok"), col("body_bytes"))).as("sum_body_bytes"))
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
