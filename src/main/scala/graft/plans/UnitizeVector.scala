package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst unit-normalization of a dense vector:
  * `array<float|double>` → unit-length `array<double>`.
  *
  * Companion to [[DotProduct]] at the other end of the similarity hot
  * path: every vector operator (cosine pairs, LSH bucketing, ANN, top-k)
  * unit-normalizes its corpus ONCE per row before any pairwise work, and
  * doing that through a Scala UDF forces a SerDe boundary in the scan
  * projection — each ArrayData deserialized into a Seq, re-boxed, and the
  * projection stage dropped out of whole-stage codegen. This expression
  * stays inside codegen and reads/writes array buffers directly.
  *
  * Arithmetic is IDENTICAL to `VectorFns.unitizeUdf` (float→double cast
  * first, one sequential x·x accumulation, sqrt, one divide pass) so
  * results are bit-equal and the DuckDB oracles are unaffected by which
  * path an operator uses (pinned in DotProductSpec). A zero vector
  * divides 0/0 → NaN elements, matching the UDF; element nulls are
  * out of contract (embedding vectors), as with [[DotProduct]].
  */
case class UnitizeVector(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  // array<float> input arrives via an implicit Cast to array<double> —
  // the same eager float→double widening the UDF performs
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_unitize"

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) { val d = x.getDouble(i); out(i) = d; s += d * d; i += 1 }
    val nrm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / nrm; i += 1 }
    // unboxed result buffer: GenericArrayData(double[]) boxes every
    // element (toSeq → Array[Any]), which downstream getDouble unboxes
    // again — fromPrimitiveArray keeps the primitives in one flat buffer
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("uN")
      val out = ctx.freshName("uOut")
      val s = ctx.freshName("uS")
      val i = ctx.freshName("uI")
      val nrm = ctx.freshName("uNrm")
      val d = ctx.freshName("uD")
      s"""
         |int $n = $v.numElements();
         |double[] $out = new double[$n];
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $v.getDouble($i);
         |  $out[$i] = $d;
         |  $s += $d * $d;
         |}
         |double $nrm = java.lang.Math.sqrt($s);
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $out[$i] / $nrm;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitizeVector =
    copy(child = newChild)
}

object UnitizeVector {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Column wrapper (classic-mode bridge). */
  def unitize(v: Column): Column =
    Bridge.column(UnitizeVector(Bridge.expression(v)))
}
