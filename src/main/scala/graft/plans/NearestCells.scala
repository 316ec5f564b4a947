package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native top-p nearest-centroid assignment — the r18 shuffle fix for the
  * engine's coarse quantizer.
  *
  * The previous `assignCells` plan was a crossJoin fanout (k rows per
  * input row, each carrying the FULL vector and the matched centroid
  * vector) followed by a per-id rank window — i.e. an EXCHANGE of the
  * k-fanout hash-partitioned by id, paid on every Lloyd iteration of
  * k-means training, every index build/append/ingest encode pass, every
  * IVF probe, and every semantic-dedup blocking pass. WindowGroupLimit
  * trims the post-shuffle rows but the corpus (×p, with vector payloads)
  * still crosses the wire — at 100 TB that exchange IS the training
  * cost. This kernel reads the bounded centroid table as a FLAT
  * `array<double>` plan constant (the [[PqKernels]] layout) and selects
  * the top-p cells per row in one whole-stage-codegen map pass: zero
  * fanout, zero exchange, zero sort.
  *
  * Determinism contract (the window path is kept as the spec-pinned
  * reference twin — `Similarity.assignCellsWindowRanked`): dots
  * accumulate in [[DotProduct]]'s exact element order with its
  * min-length semantics, and selection orders by
  * `java.lang.Double.compare` descending — Spark's own double ordering,
  * so NaN ranks ABOVE +∞ exactly as the window's `orderBy(desc)` did —
  * with ties to the smallest centroid INDEX. Callers feed centroids
  * sorted by cell id (Spark-side `orderBy("cell")`), making index order
  * equal the window's cell-id tie-break. One deliberate divergence: a
  * NULL input vector propagates NULL (the row drops at the explode)
  * where the window path assigned it to the p smallest cells by
  * tie-break — an accident of NULL ordering, not a contract anyone
  * relies on (embedding NULLs are an `embed_integrity` defect).
  */
object NearestCells {

  /** Indices of the `p` nearest (highest-dot) centroids among `k` flat
    * rows of `cents`, ordered best-first; emits min(p, k) entries. */
  def topP(v: ArrayData, cents: ArrayData, k: Int, p: Int): ArrayData = {
    val total = cents.numElements()
    if (total % k != 0)
      throw new IllegalArgumentException(
        s"nearest-cells: flat centroid constant carries $total entries, " +
          s"not divisible by k=$k rows — torn or mismatched centroid table")
    val dim = total / k
    val keep = math.min(p, k)
    val bestD = new Array[Double](keep)
    val bestI = new Array[Int](keep)
    var filled = 0
    var c = 0
    while (c < k) {
      val base = c * dim
      val n = math.min(v.numElements(), dim)
      var s = 0.0
      var j = 0
      while (j < n) { s += v.getDouble(j) * cents.getDouble(base + j); j += 1 }
      // insertion point: entries strictly better stay ahead; equal-dot
      // entries also stay ahead (they carry smaller indices — the
      // window's cell-asc tie-break)
      var pos = filled
      while (pos > 0 && java.lang.Double.compare(bestD(pos - 1), s) < 0)
        pos -= 1
      if (pos < keep) {
        var q = math.min(filled, keep - 1)
        while (q > pos) { bestD(q) = bestD(q - 1); bestI(q) = bestI(q - 1); q -= 1 }
        bestD(pos) = s
        bestI(pos) = c
        if (filled < keep) filled += 1
      }
      c += 1
    }
    // filled always reaches keep: each of the first `keep` iterations
    // necessarily inserts (pos <= filled < keep), and k >= keep
    UnsafeArrayData.fromPrimitiveArray(bestI)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  def topPCol(v: Column, flatCents: Column, k: Int, p: Int): Column =
    Bridge.column(NearestCellsExpr(
      Bridge.expression(v), Bridge.expression(flatCents), k, p))
}

/** `array<int>` of the min(p, k) nearest-centroid indices for a vector
  * against a flat k×dim centroid constant, best-first. */
case class NearestCellsExpr(left: Expression, right: Expression, k: Int, p: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"k must be >= 1, got $k")
  require(p >= 1, s"p must be >= 1, got $p")

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_nearest_cells"

  override def nullSafeEval(v: Any, cents: Any): Any =
    NearestCells.topP(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], k, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, c) => s"graft.plans.NearestCells.topP($v, $c, $k, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellsExpr =
    copy(left = newLeft, right = newRight)
}
