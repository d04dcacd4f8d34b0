package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, StructField, StructType}

/** `media_header_parse(payload)` — parse a media container header out of an
  * opaque `binary` column in one codegen pass: REAL byte-level decoding
  * (magic check, little-endian field assembly), the step a 100 TB
  * multimodal pipeline runs before any pixel work, over the GM01 container
  * layout (a BMP-style fixed header):
  *
  * {{{
  * offset 0-1   magic "GM"          (0x47, 0x4D)
  * offset 2     version             (0x01)
  * offset 3     channels            (uint8)
  * offset 4-7   width               (int32, little-endian)
  * offset 8-11  height              (int32, little-endian)
  * offset 12-13 frames              (uint16, little-endian)
  * offset 14-   body (pixel/sample payload, opaque here)
  * }}}
  *
  * Output: `struct<ok: boolean, channels: int, width: int, height: int,
  * frames: int, body_bytes: int>`. A payload that is too short for the
  * header, or whose magic/version bytes mismatch, yields `ok = false` with
  * zeroed fields — a ROW, not a null, so corrupt inputs stay countable in
  * the same aggregate pass (the scrub-report shape). Only a NULL payload
  * nulls the struct (standard unary null propagation).
  *
  * Little-endian assembly is explicit byte arithmetic (`b[4] | b[5]<<8 |
  * ...`), not a ByteBuffer, so the whole parse stays inside whole-stage
  * codegen; [[graft.operators.Multimodal.parseBatched]] keeps the
  * ByteBuffer/`mapPartitions` form for decoders that need native setup,
  * and the test suite asserts the two paths agree.
  */
case class MediaHeaderParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"media_header_parse requires binary, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("body_bytes", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  /** Fixed header length in bytes (see the layout in the class doc). */
  val HeaderLen: Int = 14

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[Array[Byte]]
    val ok = b.length >= HeaderLen &&
      b(0) == 0x47.toByte && b(1) == 0x4D.toByte && b(2) == 0x01.toByte
    if (!ok) InternalRow(false, 0, 0, 0, 0, 0)
    else InternalRow(true,
      b(3) & 0xFF,
      (b(4) & 0xFF) | ((b(5) & 0xFF) << 8) | ((b(6) & 0xFF) << 16) |
        ((b(7) & 0xFF) << 24),
      (b(8) & 0xFF) | ((b(9) & 0xFF) << 8) | ((b(10) & 0xFF) << 16) |
        ((b(11) & 0xFF) << 24),
      (b(12) & 0xFF) | ((b(13) & 0xFF) << 8),
      b.length - HeaderLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val ch = ctx.freshName("ch")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val fr = ctx.freshName("fr")
      val bb = ctx.freshName("bb")
      val vals = ctx.freshName("vals")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val gir = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      // primitive locals + explicit valueOf boxing (Janino has no
      // autoboxing), and bytes unpacked into an int[] first (Janino
      // misparses a parenthesized `(expr & 0xFF) << n` as a cast)
      s"""
         |boolean $ok = $a.length >= $HeaderLen
         |  && $a[0] == (byte) 0x47 && $a[1] == (byte) 0x4D
         |  && $a[2] == (byte) 0x01;
         |int $ch = 0; int $w = 0; int $h = 0; int $fr = 0; int $bb = 0;
         |if ($ok) {
         |  int[] $b = new int[$HeaderLen];
         |  for (int $i = 3; $i < $HeaderLen; $i++) {
         |    $b[$i] = $a[$i] & 0xFF;
         |  }
         |  $ch = $b[3];
         |  $w = $b[4] | $b[5] << 8 | $b[6] << 16 | $b[7] << 24;
         |  $h = $b[8] | $b[9] << 8 | $b[10] << 16 | $b[11] << 24;
         |  $fr = $b[12] | $b[13] << 8;
         |  $bb = $a.length - $HeaderLen;
         |}
         |Object[] $vals = new Object[6];
         |$vals[0] = Boolean.valueOf($ok);
         |$vals[1] = Integer.valueOf($ch);
         |$vals[2] = Integer.valueOf($w);
         |$vals[3] = Integer.valueOf($h);
         |$vals[4] = Integer.valueOf($fr);
         |$vals[5] = Integer.valueOf($bb);
         |${ev.value} = new $gir($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderParse =
    copy(child = newChild)

  override def prettyName: String = "media_header_parse"
}

/** `media_body_stats(payload, stride)` — the BODY-level decode step over
  * GM01 containers: validate the header (same magic/version check as
  * [[MediaHeaderParse]]), then stream the opaque body bytes at a fixed
  * sampling stride and fold amplitude statistics in the same codegen pass —
  * the PCM/waveform "sampled amplitude" shape an audio pipeline runs, with
  * the body treated as unsigned 8-bit samples. At 100 TB the payload
  * column dominates the table's bytes and this pass is the one that must
  * never leave the scan stage: one loop per row, no intermediate arrays,
  * counters-only output.
  *
  * Output: `struct<ok: boolean, n_samples: int, sum_amp: long,
  * max_amp: int>`. Corrupt/short payloads yield `ok = false` with zeroed
  * stats (a row, not a null — countable in the same aggregate); only a
  * NULL payload nulls the struct.
  */
case class MediaBodyStats(child: Expression, stride: Int)
  extends UnaryExpression {

  require(stride > 0, s"media_body_stats: stride must be > 0, got $stride")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"media_body_stats requires binary, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("ok", BooleanType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("sum_amp", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("max_amp", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  private val HeaderLen: Int = 14

  override def nullSafeEval(a: Any): Any = {
    val b = a.asInstanceOf[Array[Byte]]
    val ok = b.length >= HeaderLen &&
      b(0) == 0x47.toByte && b(1) == 0x4D.toByte && b(2) == 0x01.toByte
    if (!ok) InternalRow(false, 0, 0L, 0)
    else {
      var n = 0
      var sum = 0L
      var max = 0
      var p = HeaderLen
      while (p < b.length) {
        val v = b(p) & 0xFF
        n += 1
        sum += v
        if (v > max) max = v
        p += stride
      }
      InternalRow(true, n, sum, max)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ok = ctx.freshName("ok")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val max = ctx.freshName("max")
      val v = ctx.freshName("v")
      val p = ctx.freshName("p")
      val vals = ctx.freshName("vals")
      val gir = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      s"""
         |boolean $ok = $a.length >= $HeaderLen
         |  && $a[0] == (byte) 0x47 && $a[1] == (byte) 0x4D
         |  && $a[2] == (byte) 0x01;
         |int $n = 0; long $sum = 0L; int $max = 0;
         |if ($ok) {
         |  for (int $p = $HeaderLen; $p < $a.length; $p += $stride) {
         |    int $v = $a[$p] & 0xFF;
         |    $n++;
         |    $sum += $v;
         |    if ($v > $max) { $max = $v; }
         |  }
         |}
         |Object[] $vals = new Object[4];
         |$vals[0] = Boolean.valueOf($ok);
         |$vals[1] = Integer.valueOf($n);
         |$vals[2] = Long.valueOf($sum);
         |$vals[3] = Integer.valueOf($max);
         |${ev.value} = new $gir($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MediaBodyStats =
    copy(child = newChild)

  override def prettyName: String = "media_body_stats"
}

object MediaHeaderParse {
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 1) {
      throw new IllegalArgumentException(
        s"media_header_parse requires exactly 1 argument, got ${children.length}")
    }
    MediaHeaderParse(children.head)
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[MediaHeaderParse].getName, "media_header_parse")
}

object MediaBodyStats {
  /** SQL form: `media_body_stats(payload, stride)` — stride must be a
    * foldable positive integer literal (it is baked into the generated
    * loop).
    */
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 2) {
      throw new IllegalArgumentException(
        s"media_body_stats requires (payload, stride), got ${children.length} args")
    }
    val strideExpr = children(1)
    if (!strideExpr.foldable || strideExpr.dataType != IntegerType) {
      throw new IllegalArgumentException(
        "media_body_stats: stride must be an integer literal")
    }
    val stride = strideExpr.eval().asInstanceOf[Int]
    MediaBodyStats(children.head, stride)
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[MediaBodyStats].getName, "media_body_stats")
}
