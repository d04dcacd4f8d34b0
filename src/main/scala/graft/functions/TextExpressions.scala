package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_stats(text, n)` — min/max xxhash64 over all word n-gram
  * shingles of a document, plus shingle/token counts, in ONE pass over the
  * raw UTF-8 bytes.
  *
  * The engine's third custom Expression (after [[DotProduct]] and
  * [[MinHashes]]), added on measured need: the previous winnowing
  * formulation materialized every token (`posexplode`), reassembled each
  * n-gram with a `lead` window (a full shuffle + per-doc sort), and
  * re-aggregated — ~1.9 s of the sf0.1 bench for what is per-row map work.
  * A shingle starting at token i is a byte SLICE of the document (token
  * separators are single 0x20 bytes, which never occur inside a multi-byte
  * UTF-8 sequence), so each candidate hash is one
  * `XXH64.hashUnsafeBytes` over the document's own buffer — no token
  * strings, no gram strings, no shuffle are ever materialized.
  *
  * Bit-identical to `xxhash64(concat_ws(" ", tokens i..i+n-1))` over
  * `split(text, " ")` tokens (asserted by OperatorPropertiesSpec): Spark's
  * `split` on a single-space pattern keeps interior AND trailing empty
  * tokens (limit −1), so token boundaries are exactly the 0x20 positions,
  * and `xxhash64` on a string hashes its UTF-8 bytes with seed 42.
  *
  * Returns null when the document has fewer than `n` tokens (the window
  * formulation dropped those docs); callers filter on it explicitly.
  */
case class ShingleStats(child: Expression, n: Int)
  extends UnaryExpression {

  // direct Scala construction must fail fast too (the SQL builder already
  // validates): n <= 0 would feed a NEGATIVE length into
  // XXH64.hashUnsafeBytes, which hashes a malformed range into a garbage
  // but plausible fingerprint instead of throwing
  require(n >= 1, s"shingle_stats needs n >= 1; got $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_stats requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("min_hash", LongType, nullable = false),
    StructField("max_hash", LongType, nullable = false),
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false)))

  // null for docs shorter than n tokens (no shingle exists)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ShingleStats.compute(a.asInstanceOf[UTF8String], n)

  // codegen emits a single static-shaped call into the same JIT-compiled
  // loop eval uses — the expression stays inside the WholeStageCodegen
  // span (no CodegenFallback barrier) and the two paths cannot diverge
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val row = ctx.freshName("row")
      s"""
         |InternalRow $row = graft.functions.ShingleStats.compute($a, $n);
         |if ($row == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $row;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleStats =
    copy(child = newChild)

  override def prettyName: String = "shingle_stats"
}

/** `simhash64(text)` — the 64-bit token-level SimHash in ONE pass over the
  * raw UTF-8 bytes.
  *
  * The engine's fourth custom Expression, added on the same measured-need
  * basis as [[ShingleStats]]: the explode formulation materialized every
  * token occurrence as a UTF8String (~2.5M per sf0.1 pass), hashed it,
  * pre-aggregated (doc_id, hash) counts, and ran a 32-packed-long vote
  * aggregate — r14 bench telemetry showed it as the highest task-GC line
  * of the dedup family (4.9 s GC attributed to a ~2 s sample). Here each
  * token is a byte SLICE of the document (separators are single 0x20
  * bytes, never inside a multi-byte UTF-8 sequence), hashed in place with
  * `XXH64.hashUnsafeBytes`; the 64 vote counters live in one stack array.
  *
  * Semantics are IDENTICAL to the aggregate formulation (asserted
  * bit-for-bit by OperatorPropertiesSpec): summing votes per occurrence
  * equals summing per distinct token weighted by its count, `split(text,
  * " ")` keeps interior and trailing empty tokens (limit −1) so token
  * boundaries are exactly the 0x20 positions (empty tokens hash the empty
  * slice, as `xxhash64('')` does), and bit i is set iff
  * `2·ones_i > n_tokens` — the same bias identity the packed aggregate
  * used. Per-doc work is linear in bytes + 64·tokens; nothing shuffles.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** One pass: hash each 0x20-delimited byte slice (xxhash64 seed 42 —
    * identical to `xxhash64(token_string)`), accumulate per-bit ones
    * counts, emit bit i iff 2·ones(i) > n_tokens. Shared verbatim by eval
    * and generated code.
    */
  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    val ones = new Array[Int](64)
    var n = 0
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        n += 1
        var b = 0
        while (b < 64) {
          ones(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (2L * ones(b) > n) out |= 1L << b
      b += 1
    }
    out
  }

  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 1) {
      throw new IllegalArgumentException(
        s"simhash64 requires exactly 1 argument, got ${children.length}")
    }
    SimHash64(children.head)
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64")
}

object ShingleStats {
  /** One pass over the document bytes: count tokens, record token start
    * offsets, hash every n-token byte slice. Shared verbatim by eval and
    * generated code.
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var nTokens = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < n) return null
    // starts(k) = byte index of token k's first byte
    val starts = new Array[Int](nTokens)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    var minH = Long.MaxValue
    var maxH = Long.MinValue
    val nShingles = nTokens - n + 1
    var g = 0
    while (g < nShingles) {
      val b = starts(g)
      // shingle g spans tokens [g, g+n-1]: ends one byte before token g+n
      // starts (the separator), or at the document end for the last window
      val e = if (g + n == nTokens) len else starts(g + n) - 1
      val h = XXH64.hashUnsafeBytes(base, off + b, e - b, 42L)
      if (h < minH) minH = h
      if (h > maxH) maxH = h
      g += 1
    }
    new GenericInternalRow(Array[Any](minH, maxH, nShingles, nTokens))
  }

  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 2) {
      throw new IllegalArgumentException(
        s"shingle_stats requires exactly 2 arguments, got ${children.length}")
    }
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) if v >= 1 => v
      case other => throw new IllegalArgumentException(
        s"shingle_stats width must be a positive integer literal, got $other")
    }
    ShingleStats(children(0), n)
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[ShingleStats].getName, "shingle_stats")
}
