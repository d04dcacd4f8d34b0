package graft.sink

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Row → JSON document encoding — the reference sink's core transform
  * (reference `HiveStreamDataWriter.scala:96-100`: each row becomes a
  * `{col: value}` JSON object via json4s reflection before the Hive write).
  *
  * Re-expressed without reflection: the encoder is compiled once per schema
  * into an array of per-field appenders dispatched on the Catalyst
  * [[DataType]], then reused for every row — no per-row type inspection in
  * the hot path. Scalar types only, matching the reference's support surface
  * (`HiveWriter.scala:69` TODO admits JSON-scalar-only support).
  */
final class JsonRowEncoder(schema: StructType, fieldIndices: Seq[Int]) {

  private[this] val names: Array[String] =
    fieldIndices.map(i => JsonRowEncoder.escape(schema(i).name)).toArray

  private[this] val appenders: Array[(InternalRow, Int, StringBuilder) => Unit] =
    fieldIndices.map { i =>
      val dt = schema(i).dataType
      val append = JsonRowEncoder.appenderFor(dt)
      (row: InternalRow, ordinal: Int, sb: StringBuilder) =>
        append(row, ordinal, sb)
    }.toArray

  private[this] val ordinals: Array[Int] = fieldIndices.toArray

  /** Append `{"c1": v1, ...}` for the configured fields of `row`. */
  def encode(row: InternalRow, sb: StringBuilder): Unit = {
    sb.append('{')
    var i = 0
    while (i < ordinals.length) {
      if (i > 0) sb.append(',')
      sb.append('"').append(names(i)).append("\":")
      if (row.isNullAt(ordinals(i))) sb.append("null")
      else appenders(i)(row, ordinals(i), sb)
      i += 1
    }
    sb.append('}')
  }
}

object JsonRowEncoder {

  /** JSON string escaping (quote, backslash, control chars). */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private[sink] def appenderFor(
      dt: DataType): (InternalRow, Int, StringBuilder) => Unit = dt match {
    case StringType =>
      (r, i, sb) => sb.append('"').append(escape(r.getUTF8String(i).toString)).append('"')
    case IntegerType => (r, i, sb) => sb.append(r.getInt(i))
    case LongType => (r, i, sb) => sb.append(r.getLong(i))
    case ShortType => (r, i, sb) => sb.append(r.getShort(i).toInt)
    case ByteType => (r, i, sb) => sb.append(r.getByte(i).toInt)
    case DoubleType => (r, i, sb) => sb.append(r.getDouble(i))
    case FloatType => (r, i, sb) => sb.append(r.getFloat(i))
    case BooleanType => (r, i, sb) => sb.append(r.getBoolean(i))
    case d: DecimalType =>
      (r, i, sb) => sb.append(r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal.toPlainString)
    case TimestampType | TimestampNTZType =>
      // stored as epoch micros; render ISO-8601 UTC for a self-describing doc
      (r, i, sb) => {
        val micros = r.getLong(i)
        val inst = Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
        sb.append('"').append(inst.toString).append('"')
      }
    case DateType =>
      (r, i, sb) =>
        sb.append('"').append(LocalDate.ofEpochDay(r.getInt(i).toLong).toString).append('"')
    case BinaryType =>
      (r, i, sb) =>
        sb.append('"').append(java.util.Base64.getEncoder.encodeToString(r.getBinary(i))).append('"')
    case other =>
      throw new IllegalArgumentException(
        s"graft-streaming sink supports scalar columns only; got $other " +
          "(flatten arrays/structs upstream, as the reference requires " +
          "for its JSON-scalar writer)")
  }

  /** Render a partition value as its directory-path string. The reference
    * assumes string partition columns (`HiveStreamDataWriter.scala:73-74`);
    * scalars are accepted here and stringified canonically.
    */
  def partitionString(dt: DataType, row: InternalRow, i: Int): String = {
    if (row.isNullAt(i)) "__NULL__"
    else dt match {
      case StringType => sanitize(row.getUTF8String(i).toString)
      case IntegerType => row.getInt(i).toString
      case LongType => row.getLong(i).toString
      case ShortType => row.getShort(i).toString
      case ByteType => row.getByte(i).toString
      case BooleanType => row.getBoolean(i).toString
      case DateType => LocalDate.ofEpochDay(row.getInt(i).toLong).toString
      case other =>
        throw new IllegalArgumentException(
          s"Partition column type $other is not supported for routing")
    }
  }

  /** Make a partition value filesystem-safe (percent-escape separators).
    * Public: pruning predicates must compare in this encoding.
    */
  def sanitize(s: String): String = {
    // a REAL string equal to the null sentinel must not round-trip to null
    if (s == "__NULL__") return "%5F_NULL__"
    val sb = new StringBuilder(s.length)
    s.foreach {
      case c @ ('/' | '\\' | '=' | '%' | ':') => sb.append(f"%%${c.toInt}%02X")
      case c if c < ' ' => sb.append(f"%%${c.toInt}%02X")
      case c => sb.append(c)
    }
    sb.toString
  }
}
