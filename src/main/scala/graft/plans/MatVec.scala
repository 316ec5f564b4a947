package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dense matrix×vector product against a FLAT row-major matrix
  * plan constant — the rotation step of OPQ encoding
  * (`Similarity.opqRotation`: y = R·x with R orthonormal d×d). The HOF
  * spelling (`transform(sequence(...), i -> aggregate(...))`) never
  * enters whole-stage codegen and re-walks the matrix literal through
  * interpreted `element_at`s per output coordinate; this kernel is one
  * codegen'd call doing d×d fused multiply-adds over two contiguous
  * arrays (the [[PqKernels]]/[[NearestCells]] flat-constant layout —
  * build the literal with `Literal.create` in the declared input type,
  * never `typedlit`, per the duplicated-constant lesson pinned in
  * SimilaritySpec). The HOF twin stays in the spec as the
  * independently-derived reference implementation.
  */
object MatVec {

  /** y = M·x for a flat row-major (rows×dim(x)) matrix. Row count is
    * derived from the flat length; a non-divisible length is a torn
    * constant and throws rather than scoring garbage. */
  def apply(m: ArrayData, x: ArrayData): ArrayData = {
    val n = x.numElements()
    if (n == 0)
      throw new IllegalArgumentException("matvec: empty input vector")
    val total = m.numElements()
    if (total % n != 0)
      throw new IllegalArgumentException(
        s"matvec: flat matrix constant carries $total entries, not " +
          s"divisible by the input dimension $n — torn or mismatched " +
          "rotation matrix")
    val rows = total / n
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      val base = r * n
      var s = 0.0
      var j = 0
      while (j < n) { s += m.getDouble(base + j) * x.getDouble(j); j += 1 }
      out(r) = s
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  def matVecCol(flatM: Column, v: Column): Column =
    Bridge.column(MatVecExpr(Bridge.expression(flatM), Bridge.expression(v)))
}

/** `array<double>` M·x for a vector column against a flat row-major
  * matrix constant. NULL-propagating on either side. */
case class MatVecExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_matvec"

  override def nullSafeEval(m: Any, x: Any): Any =
    MatVec(m.asInstanceOf[ArrayData], x.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, x) => s"graft.plans.MatVec.apply($m, $x)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVecExpr =
    copy(left = newLeft, right = newRight)
}
