package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a word against a unigram-LM piece vocabulary —
  * the kernel behind [[graft.operators.TextAnalysis.unigramVocab]] /
  * `unigramEncode` (Kudo, ACL 2018 — the SentencePiece unigram model's
  * decode step, here also the hard-EM E-step).
  *
  * Costs are INTEGER micro-nats (`round(-ln(p)·10⁶)`, prepared by the
  * caller): the DP then runs in exact integer arithmetic, so the chosen
  * segmentation is bit-reproducible across engines — the BPE family's
  * exact-integer-argmax lesson applied to a shortest-path problem. The
  * one FP step (the log) happens BEFORE quantization, once per piece,
  * on both engines' libm; a last-ulp log divergence must cross a 0.5
  * micro-nat rounding boundary to flip anything.
  *
  * DP: `D[j] = min over i ∈ [j−maxPieceLen, j−1] with word[i..j) in the
  * vocab of D[i] + cost(piece)`, positions in code points. Tie-break is
  * total and deterministic: candidates are scanned in ASCENDING i with
  * a strict `<`, so among equal-cost paths the transition with the
  * SMALLEST predecessor (the LONGEST last piece) wins at every
  * position — mirrored by the oracle's ordered CASE. A word with no
  * segmentation under the vocab (an uncovered character) returns NULL;
  * induction callers never see it (every single character is kept in
  * the vocabulary by construction). NULL word → NULL; empty word → an
  * empty array.
  *
  * The piece table rides as a plan reference object (the
  * [[BpeTokenCount]] pattern): built once on the driver — it is a
  * bounded MODEL artifact, never data-sized — shipped with the
  * serialized plan, shared by every row. Per-row cost is
  * O(len · maxPieceLen) hash probes; fully codegen-compatible. */
case class UnigramSegment(
    child: Expression, pieces: Seq[(String, Long)], maxPieceLen: Int,
    unkCost: Option[Long] = None)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val prepared =
    UnigramSegment.prepare(pieces, maxPieceLen, unkCost)

  override def nullSafeEval(w: Any): Any =
    UnigramSegment.segment(w.asInstanceOf[UTF8String], prepared)

  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramPieces", prepared,
      classOf[UnigramSegment.Prepared].getName)
    nullSafeCodeGen(ctx, ev, w =>
      s"""${ev.value} = graft.plans.UnigramSegment.segment($w, $ref);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Column wrapper: the Viterbi-optimal piece array of `word` under the
    * integer-cost vocabulary, NULL when the word is not coverable.
    * `unkCost` (serving-path option): an out-of-vocabulary SINGLE
    * character segments as its own piece at this cost instead of making
    * the word uncoverable — the SentencePiece `<unk>` fallback, for
    * applying a STORED vocabulary to text whose alphabet the training
    * corpus never saw. Induction callers leave it None: there every
    * character is in the vocabulary by construction, and a silent
    * fallback would mask a model bug. */
  def segment(
      word: Column, pieces: Seq[(String, Long)], maxPieceLen: Int,
      unkCost: Option[Long] = None): Column =
    Bridge.column(UnigramSegment(Bridge.expression(word), pieces,
      maxPieceLen, unkCost))

  final class Prepared(
      val costs: java.util.HashMap[String, java.lang.Long],
      val maxLen: Int, val unk: Long, val hasUnk: Boolean)
    extends Serializable

  def prepare(
      pieces: Seq[(String, Long)], maxPieceLen: Int,
      unkCost: Option[Long] = None): Prepared = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(unkCost.forall(c => c >= 0 && c < Big),
      s"unkCost must be in [0, 2^60), got $unkCost")
    val m = new java.util.HashMap[String, java.lang.Long]()
    pieces.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    new Prepared(m, maxPieceLen, unkCost.getOrElse(0L), unkCost.isDefined)
  }

  private val Big = 1L << 60

  /** Shared by interpreted eval and generated code. Returns NULL (not an
    * empty array) when no segmentation covers the word. */
  def segment(word: UTF8String, p: Prepared): GenericArrayData = {
    val s = word.toString
    // code-point boundaries (the BpeTokenCount framing: DuckDB's substr
    // counts code points, so the mirror must too)
    val bounds = new java.util.ArrayList[Integer]()
    bounds.add(0)
    var ci = 0
    while (ci < s.length) {
      ci += Character.charCount(s.codePointAt(ci))
      bounds.add(ci)
    }
    val n = bounds.size - 1
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val d = new Array[Long](n + 1)
    val pick = new Array[Int](n + 1)
    java.util.Arrays.fill(d, Big)
    d(0) = 0L
    var j = 1
    while (j <= n) {
      var best = Big
      var bi = -1
      var i = math.max(0, j - p.maxLen)
      // ASCENDING i with strict < : smallest predecessor wins ties
      while (i < j) {
        if (d(i) < Big) {
          val c = p.costs.get(s.substring(bounds.get(i), bounds.get(j)))
          if (c != null) {
            val t = d(i) + c.longValue()
            if (t < best) { best = t; bi = i }
          } else if (p.hasUnk && i == j - 1) {
            // serving fallback: an OOV single character is its own
            // piece at the unk cost (never multi-char spans — those
            // decompose to their characters)
            val t = d(i) + p.unk
            if (t < best) { best = t; bi = i }
          }
        }
        i += 1
      }
      d(j) = best
      pick(j) = bi
      j += 1
    }
    if (d(n) >= Big) return null
    var cnt = 0
    var jj = n
    while (jj > 0) { cnt += 1; jj = pick(jj) }
    val out = new Array[Any](cnt)
    var w = cnt - 1
    jj = n
    while (jj > 0) {
      val i = pick(jj)
      out(w) = UTF8String.fromString(s.substring(bounds.get(i), bounds.get(jj)))
      w -= 1
      jj = i
    }
    new GenericArrayData(out)
  }
}
