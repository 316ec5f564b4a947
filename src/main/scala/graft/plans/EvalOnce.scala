package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper marked NON-DETERMINISTIC — an optimizer fence for an
  * expensive (but genuinely deterministic) expression: the optimization
  * guide's §4.4 duplicated-UDF fix applied to native expression trees.
  *
  * Why it exists: a filter on a column computed by an expensive expression
  * is pushed below the computing projection with the alias SUBSTITUTED by
  * its defining expression, and onward below any repartition — the
  * expression is then evaluated inside the pushed filter for EVERY input
  * row and AGAIN in the surviving projection above. Profiled on the
  * corpus-pipeline keys at sf0.1: the lang-id + quality-score filters
  * pushed below [[graft.engine.Fan]]'s scale-adaptive repartition into the
  * indivisible single-split parquet scan task — serializing the most
  * CPU-dense part of the pipeline on one core of 32 AND paying it twice.
  * Wrapping the computed column in this fence stops the optimizer from
  * substituting, duplicating, or reordering past it: one evaluation, above
  * the fan-out, at any scale (at production size the fan is the identity
  * and the fence still halves the lang-id cost by preventing the double
  * evaluation).
  *
  * Results are unchanged — the child IS deterministic; only the
  * optimizer's freedom is narrowed. Apply to EXPENSIVE columns only: the
  * fence also blocks legitimate predicate pushdown past the column, which
  * is exactly the trade the guide prescribes for expensive evaluations
  * ("apply it to the expensive UDFs, not blanket"). Evaluation and codegen
  * delegate to the child unchanged (the TaggingExpression pattern), so the
  * wrapped expression stays inside whole-stage codegen.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  // UnaryExpression would inherit foldable = child.foldable, and a foldable
  // child lets ConstantFolding silently DELETE the fence (folding is
  // gated on foldable, not deterministic) — the fence must be
  // unconditional, so a future caller wrapping a literal-derived column
  // keeps the single-evaluation guarantee instead of losing it silently.
  override val foldable: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_eval_once"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)

  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Column wrapper (classic-mode bridge). */
  def once(c: Column): Column = Bridge.column(EvalOnce(Bridge.expression(c)))
}
