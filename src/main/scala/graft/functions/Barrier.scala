package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself non-deterministic.
  *
  * Purpose: pin an EXPENSIVE projected column in place. Catalyst's
  * filter pushdown (`PushPredicateThroughNonJoin`) substitutes
  * projected aliases into filter conditions with NO cost guard — a
  * `where` over a derived column inlines the column's whole defining
  * expression once per reference (measured on q_stratified_sample:
  * the language-ID scores inlined ~8× into one Filter, 104 lambda
  * filters + 8 regexes per input row). `CollapseProject` has a
  * multi-reference cost guard; filter pushdown does not. Wrapping the
  * alias in this barrier makes the projection non-collapsible AND
  * non-pushable (both rules require deterministic fields), so the
  * expression is evaluated exactly once per row and the filter reads
  * the materialized attribute. This is the guide's §4.4 discipline
  * ("mark expensive UDFs non-deterministic to stop the optimizer
  * duplicating them") applied to a native expression.
  *
  * The wrapped value IS deterministic in fact — the flag is only an
  * optimizer fence (same contract as `asNondeterministic()` on a
  * deterministic UDF): results, retries and replays are unaffected,
  * codegen passes straight through to the child (zero runtime cost),
  * and the expression never extends Nondeterministic so it needs no
  * per-partition initialization.
  *
  * Use ONLY under a filter/consumer that multiply references an
  * expensive derived column; a barrier on a cheap column just blocks
  * legitimate optimizations.
  */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
  override def prettyName: String = "opt_barrier"
}

object Barrier {
  /** Column API: `barrier(expensiveCol)` — identity value, optimizer
    * fence (see [[OptimizerBarrier]]). */
  def barrier(c: Column): Column =
    org.apache.spark.sql.graft.bridge.column(
      OptimizerBarrier(org.apache.spark.sql.graft.bridge.expression(c)))
}
