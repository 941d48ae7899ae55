package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `gram_hits(arr)` — how many elements of a string array belong to a
  * fixed reference set, as a codegen'd Catalyst expression.
  *
  * This is the scan-local decontamination kernel: the benchmark gram
  * set (small BY CONTRACT — eval sets are MBs while the corpus is TBs)
  * is collected once on the driver and rides whole-stage codegen as a
  * reference `HashSet`, so per-row cost is O(|doc grams|) with no
  * explode, no join and no aggregation — the same constant-table-as-
  * reference-object discipline as [[VecExpressions.LshBuckets]] /
  * [[VecExpressions.CentTopK]] (a literal-array `array_intersect`
  * would rebuild the lookup structure per row; a broadcast join would
  * force a second traversal of whatever produced the array column).
  * Over a DISTINCT gram array (see [[graft.operators.Dedup.shinglesOf]])
  * the count equals the distinct-overlap the broadcast-join form
  * ([[graft.operators.TextAnalysis.contamination]]) computes —
  * [[graft.operators.Curation]] relies on that equivalence.
  *
  * Null semantics: null array → null; null ELEMENTS are skipped (a
  * null never matches a gram).
  */
object GramHits {

  case class GramHitsExpr(child: Expression, grams: Seq[String])
      extends UnaryExpression {

    override def dataType: DataType = IntegerType

    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"gram_hits needs array<string> input, got $other")
      }

    /** Built once per expression instance, shipped to codegen as a
      * reference object — never generated code. */
    @transient private lazy val gramSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](math.max(16, grams.size * 2))
      grams.foreach(g => s.add(UTF8String.fromString(g)))
      s
    }

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var hits = 0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && gramSet.contains(a.getUTF8String(i))) hits += 1
        i += 1
      }
      hits
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val setRef = ctx.addReferenceObj("gramSet", gramSet,
        "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
      nullSafeCodeGen(ctx, ev, arr => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        s"""
           |int $n = $arr.numElements();
           |int ${ev.value}Acc = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) {
           |    ${ev.value}Acc++;
           |  }
           |}
           |${ev.value} = ${ev.value}Acc;
         """.stripMargin
      })
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gram_hits"
  }

  import org.apache.spark.sql.graft.bridge.{column, expression}

  def gram_hits(arr: Column, grams: Seq[String]): Column =
    column(GramHitsExpr(expression(arr), grams))
}
