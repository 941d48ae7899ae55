package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import graft.functions.codec.{DeltaOfDelta, Gorilla}

/** Catalyst expressions for the segment codecs (SURVEY.md §2.7):
  * `gorilla_encode/decode` for float64 signals, `dod_encode/decode`
  * for µs timestamps. Custom expressions (not UDFs) so they
  * participate in null handling/eval without SerDe overhead;
  * CodegenFallback is fine here — each call processes a whole
  * segment array, so per-call overhead is amortized over hundreds of
  * points and the hot loop is the codec itself, already tight JVM
  * byte/bit twiddling.
  */
object CodecExpressions {

  case class GorillaEncode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def checkInputDataTypes() = {
      child.dataType match {
        case ArrayType(DoubleType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"gorilla_encode needs array<double>, got $t")
      }
    }
    override def nullSafeEval(v: Any): Any =
      Gorilla.encode(v.asInstanceOf[ArrayData].toDoubleArray())
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "gorilla_encode"
  }

  case class GorillaDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(Gorilla.decode(v.asInstanceOf[Array[Byte]]))
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "gorilla_decode"
  }

  case class DodEncode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(v: Any): Any =
      DeltaOfDelta.encode(v.asInstanceOf[ArrayData].toLongArray())
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "dod_encode"
  }

  case class DodDecode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      new GenericArrayData(DeltaOfDelta.decode(v.asInstanceOf[Array[Byte]]))
    override protected def withNewChildInternal(c: Expression) = copy(c)
    override def prettyName: String = "dod_decode"
  }

  // Column-API surface
  def gorilla_encode(c: Column): Column = wrap(GorillaEncode(expression(c)))
  def gorilla_decode(c: Column): Column = wrap(GorillaDecode(expression(c)))
  def dod_encode(c: Column): Column = wrap(DodEncode(expression(c)))
  def dod_decode(c: Column): Column = wrap(DodDecode(expression(c)))

  private def expression(c: Column): Expression =
    org.apache.spark.sql.graft.bridge.expression(c)

  private def wrap(e: Expression): Column =
    org.apache.spark.sql.graft.bridge.column(e)

  /** Register the four functions for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("gorilla_encode", e => GorillaEncode(e.head), "scala_udf")
    reg.createOrReplaceTempFunction("gorilla_decode", e => GorillaDecode(e.head), "scala_udf")
    reg.createOrReplaceTempFunction("dod_encode", e => DodEncode(e.head), "scala_udf")
    reg.createOrReplaceTempFunction("dod_decode", e => DodDecode(e.head), "scala_udf")
  }
}
