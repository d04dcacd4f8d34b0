package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** `vec_dot(a, b)` — native Catalyst dot product over two array<double>
  * columns, with whole-stage codegen emitting a tight LOOP.
  *
  * The engine's first custom Expression (siblings, in arrival order:
  * [[MinHashes]], [[ShingleStats]], [[SimHash64]], and the
  * [[FreqItemsSketch]] aggregate), each added on measured need
  * (SURVEY §7.3: "only on measured need"): the higher-order-function
  * formulation (`aggregate(zip_with(...))`) executes interpreted — the
  * vector-heavy operators spend most of their time there — while unrolling
  * the sum into 64 element_at terms blows past JIT method-size limits and
  * measured 10× WORSE (see Hyperplanes.planeDot history). A loop in
  * generated code is the shape the JVM actually optimizes.
  *
  * Accumulation order is left-to-right from 0.0, bit-identical to both the
  * HOF fold and DuckDB's `list_sum([a[i]*b[i] ...])`, so oracle parity is
  * unaffected.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  }

  override def dataType: DataType = DoubleType

  // mismatched lengths yield NULL, matching the HOF fold this replaces
  // (zip_with pads with null, which nulls the aggregate) — a malformed
  // vector must surface as null, not a plausible partial sum
  override def nullable: Boolean = true

  // per-element null checks compile in PER CHILD, only where that child's
  // array type can actually hold nulls — plane/centroid literals and
  // [[VecClean]] outputs declare containsNull = false and are never
  // scanned; the hot paths hoist the corpus-side scan to one VecClean at
  // the projection boundary, so every downstream dot keeps the
  // branch-free loop (r16: the fused both-sides scan, running 64× per
  // row across the hyperplane family, measured the whole vector family
  // at interpreted-era speeds even with codegen green)
  private def mayHoldNullElems(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }
  private def leftMayBeNull: Boolean = mayHoldNullElems(left)
  private def rightMayBeNull: Boolean = mayHoldNullElems(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    // a NULL element nulls the whole dot, like the HOF fold this replaces
    // — getDouble on a null slot reads 0.0 and would produce the exact
    // "plausible partial sum" the contract above forbids. The scan runs
    // SEPARATELY from the FP fold, mirroring the generated code (fusing
    // it into the fold measurably wrecked the hot loop)
    if (leftMayBeNull || rightMayBeNull) {
      var bad = false
      if (leftMayBeNull) {
        var j = 0
        while (j < n) { bad |= x.isNullAt(j); j += 1 }
      }
      if (rightMayBeNull && !bad) {
        var j = 0
        while (j < n) { bad |= y.isNullAt(j); j += 1 }
      }
      if (bad) return null
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      // the null scan runs as its OWN tight bit-test loop so the FP fold
      // below stays pristine for the JIT — both a break inside the fold
      // (~2x) and an OR-flag fused into it (~2x) measurably wrecked the
      // cosine family's hot loop
      // a declaration is not a legal lone statement after `else`, so the
      // null-scan variant opens its own block (and closes it below) —
      // Janino otherwise rejects the class and Spark silently falls back
      // to interpreted eval for the whole vector family (the shipped r15
      // regression this file's spec now pins)
      val anyScan = leftMayBeNull || rightMayBeNull
      val scans = Seq(
        if (leftMayBeNull)
          s"""for (int $j = 0; $j < $n; $j++) { $bad |= $a.isNullAt($j); }"""
        else "",
        if (rightMayBeNull)
          s"""for (int ${j}r = 0; ${j}r < $n; ${j}r++) { $bad |= $b.isNullAt(${j}r); }"""
        else "").filter(_.nonEmpty).mkString("\n")
      val nullScan =
        if (anyScan)
          s"""{
             |boolean $bad = false;
             |$scans
             |if ($bad) { ${ev.isNull} = true; } else {
           """.stripMargin
        else "{"
      val nullScanClose = if (anyScan) "}" else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else $nullScan
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
         |$nullScanClose
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** SparkSessionExtensions hook registering the engine's custom functions:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (or
  * `withExtensions(new GraftExtensions)`), after which
  * `SELECT vec_dot(a, b)` works in SQL.
  */
object DotProduct {
  /** Arity-checked function builder shared by the extensions hook and any
    * direct FunctionRegistry registration.
    */
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 2) {
      throw new IllegalArgumentException(
        s"vec_dot requires exactly 2 arguments, got ${children.length}")
    }
    DotProduct(children(0), children(1))
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[DotProduct].getName, "vec_dot")
}

/** `vec_clean(v)` — the null-element scan HOISTED to the projection
  * boundary: nulls the whole vector when any element is null, and — the
  * point — declares `containsNull = false` on its output so every
  * downstream [[DotProduct]] keeps the branch-free loop.
  *
  * Corpus embedding columns arrive from parquet as `containsNull = true`
  * arrays, so without the hoist EVERY plane dot in the sign-LSH family
  * (64 per row in `Hyperplanes.bandKeys`) re-scans the same vector for
  * nulls — measured at sf0.1 holding the whole similarity family at
  * interpreted-era speeds even with codegen healthy. One scan per row
  * here makes 64 scans per row there disappear.
  *
  * Semantics are equivalent where it is deployed: a vector with a null
  * element previously nulled each individual dot; nulling the vector
  * itself nulls the same dots (null-propagating children), the same
  * band-key bits resolve through the same `otherwise(0)` arms, and the
  * shared `nrm > 0` guard filters the row either way.
  */
case class VecClean(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_clean requires array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // null input, or any null element, yields NULL
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      i += 1
    }
    xs
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = false;
         |for (int $i = 0; $i < $n; $i++) { $bad |= $a.isNullAt($i); }
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $a; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecClean =
    copy(child = newChild)

  override def prettyName: String = "vec_clean"
}

object VecClean {
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 1) {
      throw new IllegalArgumentException(
        s"vec_clean requires exactly 1 argument, got ${children.length}")
    }
    VecClean(children(0))
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[VecClean].getName, "vec_clean")
}

/** `vec_quant_stats(v)` — symmetric int8 quantization statistics for one
  * embedding vector in a single codegen pass:
  * `struct(scale, mse, n)` where `scale = max(|x|)/127`,
  * `q_i = floor(x_i/scale + 0.5)` (explicit half-up — `Math.round` and
  * DuckDB `round` disagree on negative halves, `floor(+0.5)` is
  * bit-identical on both engines), and
  * `mse = Σ (x_i − q_i·scale)² / n` accumulated in left-fold order so the
  * DuckDB `list_sum` oracle matches bit-for-bit (the [[DotProduct]]
  * precedent).
  *
  * The per-vector (scale, int8 codes) pair is the standard memory-scale
  * path for ANN over large corpora (4× smaller than float32, distance
  * error bounded by `mse`); the stats form keeps the operator oracled —
  * the codes themselves are `floor(x/scale + 0.5)` away wherever the
  * pipeline wants them.
  *
  * An all-zero vector has no scale; it yields (0, 0, n) and the query
  * layer excludes it (the cosine family's zero-norm convention). Null
  * input null-propagates; an empty array yields NULL (no statistics).
  */
case class VecQuantStats(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(DoubleType, true) =>
        // insist on the hoisted-clean contract instead of silently reading
        // 0.0 for null slots (the vec_dot "plausible partial sum" lesson)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "vec_quant_stats requires containsNull=false input — wrap the " +
            "column in vec_clean(...) first")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_quant_stats requires array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("mse", DoubleType, nullable = false),
    StructField("n", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(xs.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    if (maxAbs == 0.0) {
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0.0, 0.0, n))
    }
    val scale = maxAbs / 127.0
    var sq = 0.0
    i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      val r = x - math.floor(x / scale + 0.5) * scale
      sq += r * r
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, sq / n, n))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val sq = ctx.freshName("sq")
      val x = ctx.freshName("x")
      val r = ctx.freshName("r")
      val row = ctx.freshName("row")
      val gir = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $maxAbs = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = Math.abs($a.getDouble($i));
         |    if ($x > $maxAbs) $maxAbs = $x;
         |  }
         |  Object[] $row = new Object[3];
         |  if ($maxAbs == 0.0) {
         |    $row[0] = 0.0; $row[1] = 0.0; $row[2] = $n;
         |  } else {
         |    double $scale = $maxAbs / 127.0;
         |    double $sq = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $x = $a.getDouble($i);
         |      double $r = $x - Math.floor($x / $scale + 0.5) * $scale;
         |      $sq += $r * $r;
         |    }
         |    $row[0] = $scale; $row[1] = $sq / $n; $row[2] = $n;
         |  }
         |  ${ev.value} = new $gir($row);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecQuantStats =
    copy(child = newChild)

  override def prettyName: String = "vec_quant_stats"
}

object VecQuantStats {
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 1) {
      throw new IllegalArgumentException(
        s"vec_quant_stats requires exactly 1 argument, got ${children.length}")
    }
    VecQuantStats(children(0))
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[VecQuantStats].getName, "vec_quant_stats")
}

/** `vec_int8_codes(v)` — the MATERIALIZED counterpart of
  * [[VecQuantStats]]: `struct(scale, codes: array<int>)` where
  * `codes_i = floor(x_i/scale + 0.5)` under the same
  * `scale = max(|x|)/127` and the same explicit half-up rounding. The
  * stats expression proves the reconstruction error; this one produces
  * the artifact an ANN pipeline actually stores (int8 codes are 4× (8×
  * with int8 storage downstream) smaller than float32). One codegen
  * pass; all-zero and empty vectors yield NULL (no scale — the query
  * layer's exclusion convention).
  */
case class VecInt8Codes(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(DoubleType, true) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "vec_int8_codes requires containsNull=false input — wrap the " +
            "column in vec_clean(...) first")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_int8_codes requires array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return null
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(xs.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    if (maxAbs == 0.0) return null
    val scale = maxAbs / 127.0
    val codes = new Array[Int](n)
    i = 0
    while (i < n) {
      codes(i) = math.floor(xs.getDouble(i) / scale + 0.5).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, new GenericArrayData(codes)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxAbs = ctx.freshName("maxAbs")
      val scale = ctx.freshName("scale")
      val x = ctx.freshName("x")
      val codes = ctx.freshName("codes")
      val row = ctx.freshName("row")
      val gir = "org.apache.spark.sql.catalyst.expressions.GenericInternalRow"
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      s"""
         |int $n = $a.numElements();
         |double $maxAbs = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = Math.abs($a.getDouble($i));
         |  if ($x > $maxAbs) $maxAbs = $x;
         |}
         |if ($n == 0 || $maxAbs == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $scale = $maxAbs / 127.0;
         |  int[] $codes = new int[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $codes[$i] = (int) Math.floor($a.getDouble($i) / $scale + 0.5);
         |  }
         |  Object[] $row = new Object[2];
         |  $row[0] = $scale; $row[1] = new $gad($codes);
         |  ${ev.value} = new $gir($row);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecInt8Codes =
    copy(child = newChild)

  override def prettyName: String = "vec_int8_codes"
}

object VecInt8Codes {
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 1) {
      throw new IllegalArgumentException(
        s"vec_int8_codes requires exactly 1 argument, got ${children.length}")
    }
    VecInt8Codes(children(0))
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[VecInt8Codes].getName, "vec_int8_codes")
}

/** `min_hashes(hs, n)` — all `n` seeded MinHash minima over an
  * `array<bigint>` of shingle fingerprints in ONE codegen loop.
  *
  * Bit-identical to the HOF formulation it replaces
  * (`array((0 until n).map(i => array_min(transform(hs, h =>
  * xxhash64(lit(i), h)))))`, asserted by OperatorPropertiesSpec): Spark's
  * `xxhash64(lit(i), h)` folds its children as
  * `XXH64.hashLong(h, XXH64.hashInt(i, 42L))`, so the per-seed prefix
  * `hashInt(i, 42L)` is precomputed once and each fingerprint costs one
  * `hashLong` per seed. The HOF version ran n interpreted passes over the
  * array per row (HOF lambdas are CodegenFallback); this is one codegen'd
  * pass evaluating n seeds per element.
  *
  * Null semantics mirror the original exactly: a null element hashes to
  * the bare seed (a hash expression skips null children), and an empty
  * array yields n null minima (`array_min([]) = null`).
  */
case class MinHashes(child: Expression, numHashes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.types.LongType

  // fail at construction, not as a NegativeArraySizeException inside
  // generated code (or a silent zero-band signature at n = 0)
  require(numHashes >= 1, s"min_hashes needs numHashes >= 1; got $numHashes")

  // NOTE one intentional divergence from the HOF formulation: a NULL
  // input ARRAY null-propagates to a NULL signature here (standard unary
  // semantics), where array(array_min(transform(NULL, ...)), ...) yields
  // a NON-null array of n NULLs — the cleaner contract, and per-element
  // reads coincide either way

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_hashes requires array<bigint>, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](numHashes))
    val m = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < n) {
      var i = 0
      if (xs.isNullAt(j)) {
        while (i < numHashes) {
          if (seeds(i) < m(i)) m(i) = seeds(i); i += 1
        }
      } else {
        val h = xs.getLong(j)
        while (i < numHashes) {
          val v = XXH64.hashLong(h, seeds(i))
          if (v < m(i)) m(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val gad = "org.apache.spark.sql.catalyst.util.GenericArrayData"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new $gad(new Object[$numHashes]);
         |} else {
         |  long[] $m = new long[$numHashes];
         |  java.util.Arrays.fill($m, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) {
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        if ($seedsRef[$i] < $m[$i]) $m[$i] = $seedsRef[$i];
         |      }
         |    } else {
         |      long $h = $a.getLong($j);
         |      for (int $i = 0; $i < $numHashes; $i++) {
         |        long $v = $xxh.hashLong($h, $seedsRef[$i]);
         |        if ($v < $m[$i]) $m[$i] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} = new $gad($m);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashes =
    copy(child = newChild)

  override def prettyName: String = "min_hashes"
}

object MinHashes {
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 2) {
      throw new IllegalArgumentException(
        s"min_hashes requires exactly 2 arguments, got ${children.length}")
    }
    val n = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"min_hashes count must be an integer literal, got $other")
    }
    MinHashes(children(0), n)
  }

  def info: ExpressionInfo =
    new ExpressionInfo(classOf[MinHashes].getName, "min_hashes")
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"), DotProduct.info,
      DotProduct.builder _))
    ext.injectFunction((
      new FunctionIdentifier("vec_clean"), VecClean.info,
      VecClean.builder _))
    ext.injectFunction((
      new FunctionIdentifier("vec_quant_stats"), VecQuantStats.info,
      VecQuantStats.builder _))
    ext.injectFunction((
      new FunctionIdentifier("vec_int8_codes"), VecInt8Codes.info,
      VecInt8Codes.builder _))
    ext.injectFunction((
      new FunctionIdentifier("min_hashes"), MinHashes.info,
      MinHashes.builder _))
    ext.injectFunction((
      new FunctionIdentifier("shingle_stats"), ShingleStats.info,
      ShingleStats.builder _))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"), SimHash64.info,
      SimHash64.builder _))
    ext.injectFunction((
      new FunctionIdentifier("freq_items_sketch"), FreqItemsSketch.info,
      FreqItemsSketch.builder _))
    ext.injectFunction((
      new FunctionIdentifier("media_header_parse"), MediaHeaderParse.info,
      MediaHeaderParse.builder _))
    ext.injectFunction((
      new FunctionIdentifier("media_body_stats"), MediaBodyStats.info,
      MediaBodyStats.builder _))
  }
}
