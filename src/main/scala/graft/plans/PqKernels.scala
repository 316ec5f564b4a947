package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen kernels for the product-quantization family
  * (Jégou, Douze & Schmid, TPAMI 2011) — the r16→r17 hot-path fix.
  *
  * The r16 implementation expressed encode and asymmetric-distance
  * scoring as `aggregate(zip_with(...))` HOF chains over an m×ksub×dsub
  * nested codebook literal. HOF lambdas never enter whole-stage codegen:
  * every element is an interpreted eval with a per-element lambda bridge,
  * and the four registered PQ keys spent ~59 s on a 2,000-row corpus the
  * native exact dot scan ([[DotProduct]]) finishes in 0.19 s — the
  * compressed path MUST beat the exact path it approximates or PQ is
  * dead weight at any scale.
  *
  * Three kernels, all whole-stage-codegen participants over the unsafe
  * array buffers, all taking the codebook as a FLAT `array<double>`
  * literal child (a plan constant — codegen reads it as a reference, no
  * per-row cost; flat layout keeps the inner loops as contiguous
  * `getDouble(base + j)` walks with zero nested-ArrayData hops):
  *
  *  - [[PqEncodeCodes]]  vector → m nearest-codeword ids (train + encode)
  *  - [[PqQueryLut]]     query → m×ksub inner-product lookup table
  *                       (computed ONCE per query row on the broadcast
  *                       side, never per pair)
  *  - [[PqAdcScore]]     (codes, lut) → ADC score in m lookups + adds —
  *                       the standard LUT factoring of
  *                       Σ_sub dot(q_sub, codeword(sub, code))
  *
  * Determinism contract: each kernel accumulates doubles in EXACTLY the
  * HOF reference order (per-subspace inner sums in element order, then
  * subspace partials added in subspace order; argmin strict `<` keeps
  * the smallest code on exact ties), so native and HOF paths are
  * bit-identical — SimilaritySpec pins the equality and the DuckDB
  * recall oracles are unaffected by which path an operator uses.
  */
object PqKernels {

  /** Vector-vs-codebook shape guard shared by [[encode]] and [[lut]]:
    * both index the flat codebook with offsets DERIVED from the input
    * vector's own length (dsub = dim/m), so a dimension mismatch — a
    * corrupt/mixed-dim corpus row, or a codebook trained on a different
    * corpus — would otherwise read misaligned or out-of-bounds
    * UnsafeArrayData (an unguarded Platform read returning GARBAGE
    * codes/LUT entries, the exact failure mode [[adc]] guards; the HOF
    * reference path surfaced it as nulls/ANSI element_at errors). The
    * two branches cost nothing against the m×ksub×dsub work behind
    * them. */
  private def checkShape(dim: Int, cbLen: Int, m: Int, ksub: Int, what: String): Int = {
    if (dim % m != 0)
      throw new IllegalArgumentException(
        s"PQ $what: vector dimension $dim is not divisible by m=$m " +
          "subspaces — the vector and the codebook come from different " +
          "configurations (mixed-dim corpus row or foreign codebook)")
    val dsub = dim / m
    if (cbLen != m * ksub * dsub)
      throw new IllegalArgumentException(
        s"PQ $what: flat codebook carries $cbLen entries, expected " +
          s"m*ksub*dsub = ${m * ksub * dsub} (m=$m, ksub=$ksub, " +
          s"dsub=$dsub) — torn or mismatched index artifact")
    dsub
  }

  /** Shared by interpreted eval and generated code: nearest-codeword id
    * per subspace, L2, strict `<` tie-break to the smallest code. */
  def encode(v: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dim = v.numElements()
    val dsub = checkShape(dim, cb.numElements(), m, ksub, "encode")
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        val vBase = s * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = v.getDouble(vBase + j) - cb.getDouble(base + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Per-query LUT: entry [s*ksub + c] = dot(q_sub(s), codeword(s, c)). */
  def lut(q: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val dim = q.numElements()
    val dsub = checkShape(dim, cb.numElements(), m, ksub, "lut")
    val out = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      val vBase = s * dsub
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          acc += q.getDouble(vBase + j) * cb.getDouble(base + j)
          j += 1
        }
        out(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** ADC score: Σ_s lut[s*ksub + codes[s]] — m lookups + adds per
    * (corpus row × query) pair; the only per-pair work in the scan.
    *
    * Codes are bounds-checked: [[encode]] emits -1 for a subspace whose
    * every distance is NaN (a zero/NaN vector unitizes to NaN — the
    * documented UnitizeVector contract), and an unchecked
    * `UnsafeArrayData.getDouble` at a negative offset is an unguarded
    * Platform read returning GARBAGE that would rank as a real score.
    * The HOF reference path failed loudly here (ANSI `element_at` index
    * 0); the kernel must too — run `embed_integrity` to find the
    * degenerate vectors. */
  def adc(codes: ArrayData, lutArr: ArrayData, ksub: Int): Double = {
    val m = codes.numElements()
    val lutLen = lutArr.numElements()
    if (m * ksub != lutLen)
      throw new IllegalArgumentException(
        s"PQ codes carry $m subspaces but the LUT has $lutLen entries " +
          s"(expected $m x $ksub) — codes and LUT come from different " +
          "codebooks (torn or mismatched index artifact)")
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getInt(s)
      if (c < 0 || c >= ksub)
        throw new IllegalArgumentException(
          s"PQ code $c out of [0, $ksub) at subspace $s — a -1 code means " +
            "the vector encoded to NaN distances everywhere (zero/NaN " +
            "embedding); audit the corpus with embed_integrity")
      acc += lutArr.getDouble(s * ksub + c)
      s += 1
    }
    acc
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** The m×ksub×dsub codebook flattened row-major into one
    * `array<double>` plan constant — the layout all three kernels read.
    * Built directly in the kernels' declared input type
    * (`array<double>`, nullable elements) so ImplicitCastInputTypes
    * inserts no Cast: a cast of a foldable literal constant-folds into
    * a brand-new Literal, and a plan referencing the constant at more
    * than one site would ship a full copy per site (the
    * `Similarity.assignCellsRanked` lesson, pinned there by spec). */
  def flatCodebook(cb: Array[Array[Array[Double]]]): Column =
    Bridge.column(org.apache.spark.sql.catalyst.expressions.Literal.create(
      cb.flatten.flatten.toSeq,
      org.apache.spark.sql.types.ArrayType(DoubleType)))

  def encodeCol(v: Column, cb: Column, m: Int, ksub: Int): Column =
    Bridge.column(PqEncodeCodes(Bridge.expression(v), Bridge.expression(cb), m, ksub))

  def lutCol(q: Column, cb: Column, m: Int, ksub: Int): Column =
    Bridge.column(PqQueryLut(Bridge.expression(q), Bridge.expression(cb), m, ksub))

  def adcCol(codes: Column, lut: Column, ksub: Int): Column =
    Bridge.column(PqAdcScore(Bridge.expression(codes), Bridge.expression(lut), ksub))
}

/** `array<int>` of m nearest-codeword ids for a vector against a flat
  * m×ksub×dsub codebook constant — the PQ encode/training kernel. */
case class PqEncodeCodes(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(m >= 1, s"m must be >= 1, got $m")
  require(ksub >= 1, s"ksub must be >= 1, got $ksub")

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v: Any, cb: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.plans.PqKernels.encode($v, $cb, $m, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeCodes =
    copy(left = newLeft, right = newRight)
}

/** Per-query m×ksub inner-product LUT against a flat codebook constant;
  * computed on the (broadcast) query side, once per query row. */
case class PqQueryLut(left: Expression, right: Expression, m: Int, ksub: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(m >= 1, s"m must be >= 1, got $m")
  require(ksub >= 1, s"ksub must be >= 1, got $ksub")

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_pq_lut"

  override def nullSafeEval(q: Any, cb: Any): Any =
    PqKernels.lut(q.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (q, cb) => s"graft.plans.PqKernels.lut($q, $cb, $m, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqQueryLut =
    copy(left = newLeft, right = newRight)
}

/** ADC score of one compressed corpus row against one query's LUT. */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(ksub >= 1, s"ksub must be >= 1, got $ksub")

  override def inputTypes = Seq(ArrayType(IntegerType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(codes: Any, lutArr: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData], lutArr.asInstanceOf[ArrayData], ksub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (c, l) => s"graft.plans.PqKernels.adc($c, $l, $ksub)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcScore =
    copy(left = newLeft, right = newRight)
}
