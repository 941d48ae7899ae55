package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector kernels for the similarity family.
  *
  * The embedding hot loops (dot products for cosine scoring and for
  * the sign-LSH hyperplane projections) were previously
  * `aggregate(zip_with(...))` higher-order functions — semantically
  * right, but HOFs are CodegenFallback: every row allocates a zipped
  * array and interprets the fold. At millions of candidate pairs ×
  * 64 dims that interpretation dominates the stage. `vec_dot` is a
  * proper Catalyst `BinaryExpression` WITH `doGenCode`: whole-stage
  * codegen emits a tight primitive loop, no allocation.
  *
  * Exactness: the generated loop accumulates in index order 0..n−1 —
  * the SAME IEEE operation sequence as the fold it replaces — so every
  * cosine/projection is bit-identical to the HOF form (the DuckDB
  * oracle rows prove it: they replay the same sequential dot).
  * Null semantics match the aggregate/zip_with fold it replaced: a
  * null ELEMENT in either array makes the whole dot product NULL
  * (null * x propagates through the fold) — and when both element
  * types are non-nullable the generated loop carries no null checks
  * at all. Lengths are min-clamped like zip_with's shared prefix.
  */
object VecExpressions {

  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType

    private def elemNullable(e: Expression): Boolean = e.dataType match {
      case ArrayType(_, cn) => cn
      case _ => true
    }

    override def nullable: Boolean =
      left.nullable || right.nullable || elemNullable(left) || elemNullable(right)

    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      val checkNulls = elemNullable(left) || elemNullable(right)
      val lf = elemType(left) == FloatType
      val rf = elemType(right) == FloatType
      var s = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getX = if (elemType(left) == FloatType) s"(double) $x.getFloat($i)"
                   else s"$x.getDouble($i)"
        val getY = if (elemType(right) == FloatType) s"(double) $y.getFloat($i)"
                   else s"$y.getDouble($i)"
        val nullCheck =
          if (elemNullable(left) || elemNullable(right))
            s"""if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"""
          else ""
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $nullCheck
           |  $acc += $getX * $getY;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def vec_dot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))
}
