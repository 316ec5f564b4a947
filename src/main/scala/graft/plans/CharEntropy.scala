package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native character-level Shannon entropy (nats, UNROUNDED) — one
  * expression replacing the interpreted HOF chain in
  * [[graft.operators.TextAnalysis.withCharEntropy]]
  * (`aggregate(transform(array_sort(array_distinct(chars)), …))` over a
  * `transform(sequence…, substr…)` char array, kept as the reference
  * implementation the parity spec pins this against).
  *
  * Why native: the HOF path is the exact trap the winnowing family hit
  * ([[WinnowMinima]]) — higher-order lambdas never enter whole-stage
  * codegen AND re-evaluate their whole argument subtree per element, so
  * the per-distinct-char `filter(chars, _ === c)` rebuilds the n-element
  * char array |alphabet| times per document: O(|alphabet| · n²)-ish
  * interpreted work that measured **79 s at sf0.1** once the bench
  * executed the real plan (a count() had silently pruned the unread
  * entropy column, hiding the cost since the key landed). This expression
  * is one codepoint-counting pass plus an |alphabet|-sized summation.
  *
  * Output contract (bit-identical to the HOF path, parity-pinned):
  * counts are per CODEPOINT (`substr` character semantics); the Σ n·ln n
  * accumulates in ascending codepoint order — the same order as the HOF
  * path's sorted distinct single-char strings (single-codepoint UTF-8
  * strings compare as their codepoints) and the DuckDB oracle's
  * `list_sort(list_distinct(ch))`; `ln` is `StrictMath.log` (what
  * Spark's `log` function evaluates); the result is
  * `ln(n) − Σ/n`, unrounded — rounding and the empty/NULL→NULL guard
  * stay in the caller so they remain token-identical to the oracle. An
  * empty string evaluates to 0.0 (callers guard `length > 0`). */
case class CharEntropy(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    // unboxed codepoint → count map; alphabets are small (~100 for text)
    val counts = new scala.collection.mutable.LongMap[Long](64)
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts(cp.toLong) = counts.getOrElse(cp.toLong, 0L) + 1L
      n += 1L
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    val keys = counts.keysIterator.toArray
    java.util.Arrays.sort(keys)
    var acc = 0.0
    var j = 0
    while (j < keys.length) {
      val c = counts(keys(j)).toDouble
      acc += c * StrictMath.log(c)
      j += 1
    }
    StrictMath.log(n.toDouble) - acc / n
  }

  /** Column wrapper (classic-mode bridge). */
  def entropy(c: Column): Column = Bridge.column(CharEntropy(Bridge.expression(c)))
}
