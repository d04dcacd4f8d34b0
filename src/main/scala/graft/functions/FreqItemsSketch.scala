package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `freq_items_sketch(col, k)` — MERGEABLE Misra–Gries frequent-items
  * summary: at most `k` (item → lower-bound count) counters, one pass,
  * bounded memory, with the classic guarantee
  *
  *   est(x) ≤ true(x) ≤ est(x) + n/(k+1)
  *
  * for EVERY item (n = total observations), so every item with
  * true(x) > n/(k+1) is guaranteed tracked. This is the 100 TB answer to
  * corpus heavy hitters: the exact two-level vocab aggregate
  * ([[graft.operators.Text.vocabTopK]]) shuffles one partial per
  * (partition, distinct item) — fine for token vocabularies, unbounded
  * for open key domains (URLs, n-grams, user ids) — while this sketch
  * shuffles exactly `k` counters per partition whatever the domain.
  *
  * Partials merge by POINTWISE ADD then subtracting the (k+1)-th largest
  * counter and dropping non-positives — the mergeable-summaries
  * construction (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable
  * Summaries", PODS 2012, §3: public paper), which preserves the error
  * bound under ARBITRARY merge trees, hence under Spark's partial
  * aggregation. Returned estimates depend on the merge order (like every
  * sketch here: HLL, approx-percentile), so the registry query is
  * rows-only with the bound itself carried as in-output evidence.
  *
  * TypedImperativeAggregate (object buffer, ObjectHashAggregate plan) —
  * the same execution class as `collect_set`; update cost is O(1)
  * amortized (the decrement-all miss path is O(k) but prepaid by k hits).
  */
case class FreqItemsSketch(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"freq_items_sketch needs k > 0; got $k")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items_sketch requires string, got ${other.simpleString}")
    }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[UTF8String]
      buffer.get(x) match {
        case Some(c) => buffer.update(x, c + 1)
        case None if buffer.size < k =>
          // clone: the UTF8String points into a reused row buffer
          buffer.update(x.clone(), 1L)
        case None =>
          // classic MG: a miss with full counters decrements everyone
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buffer.keysIterator.foreach { key =>
            val c = buffer(key) - 1
            if (c <= 0) dead += key else buffer.update(key, c)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(buffer: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (x, c) =>
      buffer.update(x, buffer.getOrElse(x, 0L) + c)
    }
    if (buffer.size > k) {
      // subtract the (k+1)-th largest counter; ≤ k strictly-larger
      // entries survive — the merge that keeps the bound (PODS 2012 §3)
      val m = buffer.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buffer.keysIterator.foreach { key =>
        val c = buffer(key) - m
        if (c <= 0) dead += key else buffer.update(key, c)
      }
      dead.foreach(buffer.remove)
    }
    buffer
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buffer.toArray.sortBy { case (t, _) => t }
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
      new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (x, c) =>
      val b = x.getBytes
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(UTF8String.fromBytes(b), in.readLong())
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsSketch =
    copy(child = newChild)

  override def prettyName: String = "freq_items_sketch"
}

object FreqItemsSketch {
  /** Arity/literal-checked builder for SQL registration (the same shape
    * as the scalar expressions' builders — [[graft.GraftExtensions]]
    * injects it so `SELECT freq_items_sketch(tok, 64)` works from pure
    * SQL, k as an integer literal).
    */
  def builder(children: Seq[Expression]): Expression = {
    if (children.length != 2) {
      throw new IllegalArgumentException(
        s"freq_items_sketch requires exactly 2 arguments, got ${children.length}")
    }
    val k = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"freq_items_sketch k must be an integer literal, got $other")
    }
    // return the BARE AggregateFunction (like Spark's built-in aggregate
    // builders): the analyzer wraps it itself, which is what makes
    // `freq_items_sketch(x, k) FILTER (WHERE ...)` analyze — a pre-built
    // AggregateExpression would reject FILTER/DISTINCT syntax
    FreqItemsSketch(children(0), k)
  }

  def info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[FreqItemsSketch].getName, "freq_items_sketch")
}
