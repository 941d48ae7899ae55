package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregation (SURVEY.md §2.3 percentile row:
  * exact `percentile` at test scale, KLL for the 10^12-turn tier —
  * BASELINE metric names "percentile sketches" explicitly).
  *
  * `kll_sketch(v, k)` is a TypedImperativeAggregate over
  * datasketches-java's KllDoublesSketch (shipped in /opt/spark/jars):
  * mergeable, bounded-size, so rollup tiers can carry a percentile
  * column that cascades exactly like (cnt, sum, m2): tierN's sketch =
  * merge of tierN−1's sketches. `kll_quantile(sketch, q)` reads a
  * quantile out of the serialized sketch.
  */
object KllAgg {

  case class KllSketchAgg(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null) buf.update(v.asInstanceOf[Double])
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other)
      buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "kll_sketch"
  }

  /** Merge pre-aggregated sketches (tier cascade path). */
  case class KllMergeAgg(
      child: Expression,
      k: Int = 200,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): KllDoublesSketch =
      KllDoublesSketch.newHeapInstance(k)

    override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
      val v = child.eval(input)
      if (v != null)
        buf.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
      buf
    }

    override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
      buf.merge(other)
      buf
    }

    override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
    override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
    override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
      KllDoublesSketch.heapify(Memory.wrap(bytes))
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "kll_merge"
  }

  /** kll_quantile(sketch_binary, q): quantile at normalized rank q.
    * `q` must be DOUBLE — the SQL registration wraps it in a Cast
    * (a bare `0.5` literal parses as DECIMAL(1,1)). */
  case class KllQuantile(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(s: Any, q: Any): Any = {
      val sk = KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null else sk.getQuantile(q.asInstanceOf[Double])
    }
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "kll_quantile"
  }

  /** Number of items the sketch has seen (exactness check). */
  case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(s: Any): Any =
      KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]])).getN
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "kll_n"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def kll_sketch(c: Column, k: Int = 200): Column =
    column(KllSketchAgg(expression(c), k).toAggregateExpression())
  def kll_merge(c: Column, k: Int = 200): Column =
    column(KllMergeAgg(expression(c), k).toAggregateExpression())
  def kll_quantile(c: Column, q: Double): Column =
    column(KllQuantile(expression(c), expression(org.apache.spark.sql.functions.lit(q))))
  def kll_n(c: Column): Column = column(KllN(expression(c)))
}
