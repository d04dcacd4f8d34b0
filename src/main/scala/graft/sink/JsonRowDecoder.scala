package graft.sink

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Scalar-JSON line decoder, the exact inverse of [[JsonRowEncoder]] — the
  * sink's read path parses its own canonical output, so no general-purpose
  * JSON machinery is needed. Fields are matched by name against the target
  * (possibly pruned) schema; unknown keys are skipped, absent fields stay
  * null.
  */
final class JsonRowDecoder(schema: StructType) {

  private val index: Map[String, Int] =
    schema.fields.zipWithIndex.map { case (f, i) => f.name -> i }.toMap

  /** Parse one JSON-object line into an InternalRow of `schema`. */
  def decode(line: String): InternalRow = {
    val values = new Array[Any](schema.length)
    var i = skipWs(line, 0)
    require(i < line.length && line.charAt(i) == '{', s"expected '{' in: $line")
    i += 1
    var first = true
    while ({ i = skipWs(line, i); i < line.length && line.charAt(i) != '}' }) {
      if (!first) {
        require(line.charAt(i) == ',', s"expected ',' at $i in: $line")
        i = skipWs(line, i + 1)
      }
      first = false
      val (key, afterKey) = parseString(line, i)
      i = skipWs(line, afterKey)
      require(line.charAt(i) == ':', s"expected ':' at $i in: $line")
      i = skipWs(line, i + 1)
      val (raw, next) = parseValue(line, i)
      i = next
      index.get(key).foreach { ord =>
        values(ord) = convert(raw, schema.fields(ord).dataType)
      }
    }
    new GenericInternalRow(values)
  }

  private def convert(raw: Any, dt: DataType): Any = raw match {
    case null => null
    case s: String =>
      dt match {
        case StringType => UTF8String.fromString(s)
        case TimestampType | TimestampNTZType =>
          val inst = Instant.parse(s)
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        case DateType => LocalDate.parse(s).toEpochDay.toInt
        case BinaryType => java.util.Base64.getDecoder.decode(s)
        case other => throw new IllegalArgumentException(
          s"string value for non-string field type $other")
      }
    case b: java.lang.Boolean => b.booleanValue()
    case d: java.lang.Double => // NaN / ±Infinity
      dt match {
        case DoubleType => d.doubleValue()
        case FloatType => d.floatValue()
        case other => throw new IllegalArgumentException(
          s"non-finite value for field type $other")
      }
    case t: JsonRowDecoder.NumTok =>
      dt match {
        case IntegerType => t.dec.intValueExact()
        case LongType => t.dec.longValueExact()
        case ShortType => t.dec.shortValueExact()
        case ByteType => t.dec.byteValueExact()
        // parse floating targets from the RAW token: BigDecimal has no
        // signed zero, so "-0.0" would silently lose its sign
        case DoubleType => java.lang.Double.parseDouble(t.raw)
        case FloatType => java.lang.Float.parseFloat(t.raw)
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal(t.dec.setScale(d.scale), d.precision, d.scale)
        case other => throw new IllegalArgumentException(
          s"numeric value for non-numeric field type $other")
      }
  }

  private def skipWs(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t')) i += 1
    i
  }

  /** value = string | number | true | false | null; returns (value, next).
    * Bare NaN/Infinity (doubles rendered by the encoder) are accepted.
    */
  private def parseValue(s: String, from: Int): (Any, Int) = s.charAt(from) match {
    case '"' => parseString(s, from)
    case 't' => (java.lang.Boolean.TRUE, from + 4)
    case 'f' => (java.lang.Boolean.FALSE, from + 5)
    case 'n' => (null, from + 4)
    case _ =>
      var i = from
      while (i < s.length &&
        "+-0123456789.eENaInfity".indexOf(s.charAt(i)) >= 0) i += 1
      val tok = s.substring(from, i)
      if (tok == "NaN" || tok.endsWith("Infinity"))
        (java.lang.Double.valueOf(tok), i)
      else (JsonRowDecoder.NumTok(tok), i)
  }

  private def parseString(s: String, from: Int): (String, Int) = {
    require(s.charAt(from) == '"')
    val sb = new java.lang.StringBuilder
    var i = from + 1
    while (s.charAt(i) != '"') {
      val c = s.charAt(i)
      if (c == '\\') {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    (sb.toString, i + 1)
  }
}

object JsonRowDecoder {
  /** Numeric token keeping the raw text: floating targets parse from it so
    * "-0.0" keeps its sign (BigDecimal cannot represent signed zero).
    */
  private[sink] final case class NumTok(raw: String) {
    lazy val dec = new java.math.BigDecimal(raw)
  }
}
