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
  * This is the engine's one custom Expression, added on measured need
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

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
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

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"), DotProduct.info,
      DotProduct.builder _))
  }
}
