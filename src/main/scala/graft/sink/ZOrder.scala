package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-ORDER (Morton-curve) clustering key for multi-column
  * [[Compact.cluster]] rewrites — the OPTIMIZE ZORDER BY analogue of
  * log-structured table formats (Delta/Iceberg expose the same curve for
  * the same reason; the technique is Morton 1966, applied to data skipping
  * in e.g. "Small Materialized Aggregates" and the Delta OPTIMIZE docs).
  *
  * Why a curve at all: a LINEAR sort on (a, b) gives every rewritten file
  * a tight `a` range but leaves each file spanning the full `b` domain —
  * min/max skipping on `b` can never prune. Interleaving the bits of
  * per-column quantized buckets makes each size-split file a contiguous
  * z-curve segment, i.e. an approximate hyper-rectangle in (a, b, ...)
  * space: EVERY clustered column gets a usefully narrow per-file range, so
  * point/range predicates on any of them prune files via the same manifest
  * stats ([[FileStats]]) a linear cluster feeds.
  *
  * Quantization is uniform over the frame's own [min, max] per column
  * (one tiny aggregate job; the driver holds 2 doubles per column — same
  * bounded-collect posture as the IVF codebook). Uniform buckets keep the
  * mapping a pure codegen'd expression; value skew degrades bucket
  * BALANCE, never correctness — the final `repartitionByRange` on the
  * z-value re-balances ROWS across output files regardless, so skew costs
  * pruning sharpness only. Column domains:
  *
  *   - numeric / date / timestamp / boolean → cast to double;
  *   - string → first-8-byte order-preserving unsigned prefix (hex,
  *     right-padded so short strings align — byte-lexicographic order is
  *     preserved exactly within the prefix);
  *   - null → bucket 0 (groups with the domain minimum, like NULLS FIRST).
  *
  * The z-value is ONLY a sort key: it never lands in the data files, and
  * pruning reads the real columns' stats — a reader needs no knowledge
  * that the table was z-ordered.
  */
object ZOrder {

  /** Bits per dimension; 2 columns → 16-bit z, 4 → 32-bit. 256 buckets per
    * column saturates the pruning sharpness reachable with size-split
    * files long before the curve's resolution matters.
    */
  val BitsPerDim = 8

  /** The interleaved z-value expression for `cols` over `df`'s own value
    * ranges. Runs one min/max aggregate on `df` (driver-bounded: 2 doubles
    * per column). Fails loudly on column types with no order-preserving
    * numeric projection (arrays, maps, structs, binary).
    */
  def zColumn(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.size >= 2,
      "z-order needs >= 2 columns (a single column is a plain sort)")
    // the interleaved key must fit a signed long: position i*d + (d-1-di)
    // tops out at d*BitsPerDim - 1, and Spark's shiftleft wraps its shift
    // amount mod 64 (Java semantics) — 8+ columns would silently collide
    // bit positions and scramble the curve instead of failing
    require(cols.size * BitsPerDim <= 63,
      s"z-order supports at most ${63 / BitsPerDim} columns at " +
        s"$BitsPerDim bits each (the Morton key must fit a long); " +
        s"got ${cols.size}")
    val projs = cols.map(c => projection(df, c))
    val bounds = df.agg(
      projs.flatMap(p => Seq(min(p), max(p))).head,
      projs.flatMap(p => Seq(min(p), max(p))).tail: _*).head()
    val buckets = projs.zipWithIndex.map { case (p, i) =>
      val (mn, mx) = (bounds.get(2 * i), bounds.get(2 * i + 1))
      (mn, mx) match {
        case (lo: Double, hi: Double) if hi > lo =>
          // uniform bucket in [0, 2^bits): clamp both ends (the max value
          // itself would compute 2^bits; nulls coalesce to the low edge)
          least(lit((1 << BitsPerDim) - 1), greatest(lit(0),
            floor((coalesce(p, lit(lo)) - lit(lo)) /
              lit((hi - lo) / (1 << BitsPerDim).toDouble)))).cast("long")
        case _ => lit(0L) // empty dir, all-null or constant column
      }
    }
    // Morton interleave: bit i of bucket d lands at position
    // i * D + (D - 1 - d) — column order is significance order within
    // each bit level, matching the documented Delta/Iceberg convention
    val d = buckets.size
    val terms = for {
      i <- 0 until BitsPerDim
      (b, di) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1L)),
      i * d + (d - 1 - di))
    terms.reduce(_ + _)
  }

  /** Order-preserving double projection for one column. */
  private def projection(df: DataFrame, name: String): Column = {
    val field = df.schema.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"z-order column $name not in schema ${df.schema.fieldNames.mkString(", ")}"))
    val c = col(field.name)
    field.dataType match {
      case _: NumericType => c.cast("double")
      case DateType => c.cast("int").cast("double")
      case TimestampType | TimestampNTZType => c.cast("long").cast("double")
      case BooleanType => when(c, 1.0d).otherwise(0.0d)
      case StringType =>
        // first-8-byte unsigned prefix; rpad the HEX form so shorter
        // strings align ("b" must sort after "ab": 0x62... > 0x6162...)
        conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 8)), 16, "0"),
          16, 10).cast("double")
      case other => throw new IllegalArgumentException(
        s"z-order column $name: no order-preserving numeric projection " +
          s"for type ${other.simpleString}")
    }
  }
}
