package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `ArrayType(FloatType)` embedding columns
  * (SURVEY §7.6), built from Spark's higher-order functions (zip_with /
  * aggregate) so the math is codegen'd and map-side — no UDF, no shuffle.
  *
  * Elements are cast to double BEFORE any arithmetic and accumulated
  * left-to-right, which is exactly what the DuckDB oracle's list
  * comprehension + list_sum does — keeping differential results bit-stable.
  */
object VectorFns {

  /** `array<float>` -> `array<double>` (do this once, then compose). */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Signed projection against a fixed plane (literal weights) — the
    * random-hyperplane LSH bit primitive. */
  def projectBit(v: Column, weights: Seq[Double]): Column = {
    val w = array(weights.map(lit): _*)
    when(dot(v, w) >= 0, lit(1)).otherwise(lit(0))
  }
}
