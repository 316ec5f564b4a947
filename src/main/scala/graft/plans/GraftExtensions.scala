package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring (SURVEY §4): registers the engine's native
  * expressions with the SQL function registry, so `spark.sql("...
  * graft_dot(a, b) ...")` works alongside the Column API.
  *
  * Activate with `.withExtensions(new GraftExtensions)` at session build,
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in count(DISTINCT) -> HLL++ rewrite (spark.graft.approxDistinct)
    ext.injectOptimizerRule(_ => new ApproxDistinctRule)
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot requires exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_unitize"),
      new ExpressionInfo(classOf[UnitizeVector].getName, "graft_unitize"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_unitize requires exactly 1 argument, got ${children.length}")
        UnitizeVector(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          s"graft_nfc requires exactly 1 argument, got ${children.length}")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_shingles requires (text, n), got ${children.length} arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_shingles width must be an INT literal, got $other")
        }
        WordShingles(children.head, n)
      }))
  }
}
