package graft.sink

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: the sink's JSON encoder and the read path's decoder are exact
  * inverses for every scalar row — arbitrary unicode/control-character
  * strings, full-range numerics, NaN/±Infinity, nulls.
  */
class JsonRoundTripSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  private val schema = StructType(Seq(
    StructField("s", StringType),
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("b", BooleanType),
    StructField("sh", ShortType),
    StructField("dt", DateType),
    StructField("ts", TimestampType)))

  private val genRow: Gen[Seq[Any]] = for {
    s <- Gen.option(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('"', '\\', '\n', '\r', '\t', '',
        'é', '中', '€', ' ', '{', '}', ':', ','))).map(_.mkString))
    i <- Gen.option(Gen.chooseNum(Int.MinValue, Int.MaxValue))
    l <- Gen.option(Gen.chooseNum(Long.MinValue, Long.MaxValue))
    d <- Gen.option(Gen.oneOf(
      Gen.chooseNum(-1e18, 1e18), Gen.oneOf(
        Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, Double.MinPositiveValue)).flatMap(identity(_)))
    b <- Gen.option(Gen.oneOf(true, false))
    sh <- Gen.option(Gen.chooseNum(Short.MinValue, Short.MaxValue))
    dt <- Gen.option(Gen.chooseNum(-300000, 300000)) // ±~800 years of days
    ts <- Gen.option(Gen.chooseNum(-62135596800000000L, 253402300799000000L))
  } yield Seq(
    s.map(UTF8String.fromString).orNull,
    i.orNull, l.orNull, d.orNull, b.orNull, sh.orNull, dt.orNull, ts.orNull)

  test("encode ∘ decode = identity for arbitrary scalar rows") {
    val encoder = new JsonRowEncoder(schema, schema.fields.indices)
    val decoder = new JsonRowDecoder(schema)
    check(Prop.forAll(genRow) { values =>
      val row: InternalRow = new GenericInternalRow(values.toArray)
      val sb = new StringBuilder
      encoder.encode(row, sb)
      val back = decoder.decode(sb.toString)
      schema.fields.indices.forall { i =>
        val orig = if (row.isNullAt(i)) null else row.get(i, schema(i).dataType)
        val got = if (back.isNullAt(i)) null else back.get(i, schema(i).dataType)
        (orig, got) match {
          case (null, null) => true
          case (a: java.lang.Double, b: java.lang.Double) =>
            // NaN == NaN for round-trip purposes; ±0.0 must keep its sign
            java.lang.Double.doubleToLongBits(a) ==
              java.lang.Double.doubleToLongBits(b)
          case (a, b) => a == b
        }
      }
    })
  }

  test("decoder tolerates unknown keys and missing fields") {
    val decoder = new JsonRowDecoder(StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))
    val r1 = decoder.decode("""{"a":1,"zzz":"ignored","b":"x"}""")
    assert(r1.getInt(0) === 1)
    assert(r1.getUTF8String(1).toString === "x")
    val r2 = decoder.decode("""{"b":"only"}""")
    assert(r2.isNullAt(0))
    assert(r2.getUTF8String(1).toString === "only")
  }
}
