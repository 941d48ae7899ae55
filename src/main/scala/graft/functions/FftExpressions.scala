package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `fft_coeffs(array<double>) → array<struct<re double, im double>>`:
  * the full forward DFT of one record's series, O(n log n) in-JVM
  * ([[Fft]]) — the per-record vector op backing the wide-spectrum
  * form of `thunder/series/series.py :: Series.fourier`.
  *
  * A CodegenFallback expression (like the Gorilla codec exprs): the
  * FFT itself is the dominant cost, not expression dispatch, and it
  * runs once per RECORD (per key), not per row — so it never sits in
  * a row-at-a-time hot loop the way vec_dot does. Null array → null;
  * a null ELEMENT → null (HOF fold semantics). */
object FftExpressions {

  case class FftCoeffs(child: Expression)
      extends UnaryExpression with CodegenFallback {

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("re", DoubleType, nullable = false),
        StructField("im", DoubleType, nullable = false))),
      containsNull = false)

    private def elemNullable: Boolean = child.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

    override def nullable: Boolean = child.nullable || elemNullable

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"fft_coeffs needs array<double>, got $t")
    }

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val re = new Array[Double](n)
      val im = new Array[Double](n)
      var i = 0
      while (i < n) {
        if (elemNullable && arr.isNullAt(i)) return null
        re(i) = arr.getDouble(i)
        i += 1
      }
      Fft.transform(re, im)
      val rows = new Array[Any](n)
      i = 0
      while (i < n) {
        rows(i) = InternalRow(re(i), im(i))
        i += 1
      }
      new GenericArrayData(rows)
    }

    override protected def withNewChildInternal(c: Expression) = copy(child = c)
    override def prettyName: String = "fft_coeffs"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def fft_coeffs(v: Column): Column = column(FftCoeffs(expression(v)))
}
