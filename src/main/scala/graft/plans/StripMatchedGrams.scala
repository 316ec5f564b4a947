package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Copied-span removal inside one row: given a document and the DISTINCT
  * md5-hex k-gram hashes of its earlier duplicate partners, drop every
  * character covered by a k-gram the partners also contain, keeping the
  * rest in order — the per-document kernel of
  * [[graft.operators.Dedup.stripCopiedSpans]] (the Lee et al. ACL'22
  * exact-substring removal payoff: the span survives only in the earliest
  * copy).
  *
  * Coverage contract (mirrored token-for-token by the DuckDB oracle): gram
  * position i (0-based CHARACTER offset, `substr` semantics) is matched
  * iff md5 of the UTF-8 bytes of characters [i, i+k) is in the partner
  * set; character j is covered iff some matched i satisfies i ≤ j < i+k.
  * Contiguous matched grams therefore erase their whole span (a run of m
  * matched positions covers m+k−1 characters), while a lone matched gram
  * erases exactly its k characters — the k-gram length IS the minimum
  * span the operator removes. A document shorter than k characters, or
  * one sharing no gram, passes through unchanged (same object, no copy).
  *
  * Why one expression rather than a positional-explode + join + window
  * reassembly: the whole computation is per-row — hash each gram once
  * (raw-byte md5, the [[WinnowMinima]] machinery), probe a hash set built
  * from the partner array, and track covered spans with a single
  * monotonically-advancing cover-end cursor (matched ends j+k only grow
  * with j, so no interval merge is needed). O(chars) time, zero extra
  * rows, stays inside whole-stage codegen; the exploded alternative
  * shuffles |doc chars| rows per candidate document.
  *
  * Null semantics: NULL text or NULL partner array → NULL (standard
  * binary null-intolerance; callers guard with `when(isNotNull)` to pass
  * unpaired documents through).
  */
case class StripMatchedGrams(left: Expression, right: Expression, k: Int)
  extends BinaryExpression with ImplicitCastInputTypes {

  require(k >= 1, s"k-gram width must be >= 1, got $k")

  override def inputTypes = Seq(StringType, ArrayType(StringType))
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_strip_matched_grams"

  override def nullSafeEval(text: Any, hashes: Any): Any =
    StripMatchedGrams.strip(text.asInstanceOf[UTF8String],
      hashes.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, h) => s"graft.plans.StripMatchedGrams.strip($t, $h, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StripMatchedGrams =
    copy(left = newLeft, right = newRight)
}

object StripMatchedGrams {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Shared by interpreted eval and generated code. */
  def strip(s: UTF8String, hashes: ArrayData, k: Int): UTF8String = {
    val n = hashes.numElements()
    if (n == 0) return s
    val set = new java.util.HashSet[UTF8String](n * 2)
    var x = 0
    while (x < n) { set.add(hashes.getUTF8String(x)); x += 1 }
    val bytes = s.getBytes
    val len = bytes.length
    var nChars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) nChars += 1; i += 1 }
    if (nChars < k) return s
    val starts = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(nChars) = len
    val g = nChars - k + 1
    val md = WinnowMinima.digestForThread()
    val out = new Array[Byte](len)
    var w = 0
    var coverEnd = 0 // characters below this index are covered
    var j = 0
    while (j < nChars) {
      if (j < g) {
        md.reset()
        md.update(bytes, starts(j), starts(j + k) - starts(j))
        // j + k only grows with j, so the cover cursor never moves back
        if (set.contains(WinnowMinima.hex(md.digest()))) coverEnd = j + k
      }
      if (j >= coverEnd) {
        val from = starts(j)
        val until = starts(j + 1)
        System.arraycopy(bytes, from, out, w, until - from)
        w += until - from
      }
      j += 1
    }
    if (w == len) s else UTF8String.fromBytes(out, 0, w)
  }

  /** Column wrapper (classic-mode bridge). */
  def stripCol(text: Column, partnerHashes: Column, k: Int): Column =
    Bridge.column(StripMatchedGrams(
      Bridge.expression(text), Bridge.expression(partnerHashes), k))
}
