package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitter) sketch aggregation — completes the
  * engine's mergeable-sketch trio beside HLL distinct-count and KLL
  * quantiles (SURVEY.md §2.3): Apache DataSketches' ItemsSketch
  * (Misra–Gries / reverse-purge map), bounded at `maxMapSize` entries
  * regardless of stream length, mergeable with additive error bounds —
  * so a tier can carry a "top conversations" column that cascades
  * exactly like (cnt, sum, m2) and a 10^12-turn corpus pays O(groups ×
  * maxMapSize) memory, never O(distinct keys).
  *
  * Exactness regime (the certification trick, same as KLL's n ≤ k):
  * while a group's distinct-item count stays ≤ 0.75·maxMapSize the
  * sketch never purges, every estimate IS the exact count
  * (lower == upper bound), and merges of unpurged sketches stay
  * unpurged below the same bound — so a plain GROUP BY count oracle
  * certifies the whole pipeline at test scale while the approx regime
  * keeps the published a-priori error bound N·3.5/maxMapSize.
  */
object FreqAgg {

  private def serde = new ArrayOfStringsSerDe()

  private def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), serde)

  /** freq_sketch(item, maxMapSize): build a sketch from raw items. */
  case class FreqSketchAgg(
      child: Expression,
      maxMapSize: Int = 4096,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](maxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.update(v.toString)
      buf
    }

    override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
      buf.merge(other)
      buf
    }

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "freq_sketch"
  }

  /** freq_merge(sketch_binary): merge pre-aggregated sketches — the
    * tier-cascade path (1m sketches → 1h → 1d without re-reading raw). */
  case class FreqMergeAgg(
      child: Expression,
      maxMapSize: Int = 4096,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): ItemsSketch[String] =
      new ItemsSketch[String](maxMapSize)

    override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
      val v = child.eval(input)
      if (v != null) buf.merge(heapify(v.asInstanceOf[Array[Byte]]))
      buf
    }

    override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
      buf.merge(other)
      buf
    }

    override def eval(buf: ItemsSketch[String]): Any = buf.toByteArray(serde)
    override def serialize(buf: ItemsSketch[String]): Array[Byte] = buf.toByteArray(serde)
    override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = heapify(bytes)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "freq_merge"
  }

  private val itemType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false)))

  /** freq_items(sketch_binary): frequent items (no false negatives),
    * sorted by (est desc, item) so downstream top-k is deterministic.
    * In the exact regime est == lb == ub == the true count and EVERY
    * seen item is returned; in the approx regime the list is the
    * sketch's heavy-hitter set with its published error bounds. */
  case class FreqItems(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(itemType, containsNull = false)
    override def nullSafeEval(s: Any): Any = {
      val sk = heapify(s.asInstanceOf[Array[Byte]])
      val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
        .sortBy(r => (-r.getEstimate, r.getItem))
        .map(r => new GenericInternalRow(Array[Any](
          UTF8String.fromString(r.getItem), r.getEstimate, r.getLowerBound, r.getUpperBound)))
      new GenericArrayData(rows.asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "freq_items"
  }

  /** freq_estimate(sketch_binary, item): estimated count of one item. */
  case class FreqEstimate(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any, item: Any): Any =
      heapify(s.asInstanceOf[Array[Byte]]).getEstimate(item.toString)
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "freq_estimate"
  }

  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.graft.bridge.{column, expression}

  // Items are canonicalized to their EXTERNAL string form before they
  // enter the sketch (ADVICE r3): without the Cast, update() sees the
  // internal Catalyst value — a date column would store day numbers
  // and a timestamp column epoch micros, so external-form probes via
  // freq_estimate would silently return 0. The analyzer's
  // ResolveTimeZone fills the Cast's timezone, same as the SQL path.
  def freq_sketch(c: Column, maxMapSize: Int = 4096): Column =
    column(FreqSketchAgg(Cast(expression(c), StringType), maxMapSize)
      .toAggregateExpression())
  def freq_merge(c: Column, maxMapSize: Int = 4096): Column =
    column(FreqMergeAgg(Cast(expression(c), BinaryType), maxMapSize)
      .toAggregateExpression())
  def freq_items(c: Column): Column =
    column(FreqItems(Cast(expression(c), BinaryType)))
  def freq_estimate(c: Column, item: Column): Column =
    column(FreqEstimate(Cast(expression(c), BinaryType),
      Cast(expression(item), StringType)))
}
