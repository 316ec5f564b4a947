package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(FloatType)` embedding columns
  * (SURVEY §7.6).
  *
  * Elements are cast to double BEFORE any arithmetic and accumulated
  * left-to-right, which is exactly what the DuckDB oracle's list
  * comprehension + list_sum does — keeping differential results bit-stable.
  *
  * History note: interpreted higher-order-function forms (zip_with /
  * aggregate lambdas) existed first, were replaced by the ~10x-faster
  * UDF twins, then by the codegen'd native expressions. The HOF forms
  * were deleted outright once call-site-free — keeping three
  * bit-identical implementations of the same arithmetic in sync is a
  * drift hazard with no user (DotProductSpec pins the surviving
  * native/UDF pair). */
object VectorFns {

  /** Signed projection against a fixed plane (literal weights) — the
    * random-hyperplane LSH bit primitive. Uses the native DotProduct
    * expression (one codegen'd loop per plane instead of an interpreted
    * aggregate pass). */
  def projectBit(v: Column, weights: Seq[Double]): Column = {
    val w = array(weights.map(lit): _*)
    when(graft.plans.DotProduct.dot(v, w) >= 0, lit(1)).otherwise(lit(0))
  }

  // -------------------------------------------------------- fast JVM path
  //
  // UDF twins of the native expressions: the SAME arithmetic in the SAME
  // order (float→double cast, sequential left-to-right accumulation), so
  // results are bit-equal to the native forms and to the DuckDB oracle.
  // Kept alongside the natives as the reference implementation the specs
  // pin bit-equality against.

  /** float array -> unit-length double array (norm computed per ROW).
    * Output is Array[Double] (containsNull=false) so downstream UDFs get
    * primitive-array converters, not per-element boxing. */
  val unitizeUdf = udf { (v: Seq[Float]) =>
    if (v == null) null
    else {
      val d = new Array[Double](v.length)
      var i = 0
      while (i < d.length) { d(i) = v(i).toDouble; i += 1 }
      var s = 0.0
      i = 0
      while (i < d.length) { s += d(i) * d(i); i += 1 }
      val n = math.sqrt(s)
      i = 0
      while (i < d.length) { d(i) = d(i) / n; i += 1 }
      d
    }
  }

  /** Sequential dot product. Declared over Array[Double] — Catalyst then
    * converts via toDoubleArray (no boxing); with Seq[Double] every pair
    * boxed 2x64 doubles and the all-pairs bench ran 30% SLOWER than the
    * interpreted expression it replaced. */
  val dotUdf = udf { (a: Array[Double], b: Array[Double]) =>
    var s = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Native Catalyst dot product (graft.plans.DotProduct): codegen'd,
    * reads unsafe array buffers with zero per-row copies. Identical math
    * to [[dotUdf]] (DotProductSpec pins bit-equality) — the preferred form
    * in the pairwise hot paths. */
  def dotNative(a: Column, b: Column): Column = graft.plans.DotProduct.dot(a, b)

  /** Native Catalyst unit-normalization (graft.plans.UnitizeVector):
    * codegen'd, no SerDe boundary in the scan projection. Identical math
    * to [[unitizeUdf]] (DotProductSpec pins bit-equality) — the preferred
    * form wherever a corpus is normalized before pairwise work. */
  def unitizeNative(v: Column): Column = graft.plans.UnitizeVector.unitize(v)
}
