package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Unicode NFC normalization over a string column.
  *
  * Spark has no built-in Unicode normalizer, and text corpora mix composed
  * and decomposed forms of the same grapheme ("é" as U+00E9 vs e+U+0301) —
  * without canonical normalization, dedup hashes, shingles, and token
  * counts treat them as different text. A scalar UDF here would pay
  * serde + boxing per row on the hottest column in the pipeline; this
  * expression stays inside whole-stage codegen and calls the JDK's
  * normalizer directly.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation for the
  * (overwhelmingly common) already-NFC case — ASCII text short-circuits in
  * the quick-check — so only rows that actually need rewriting allocate.
  * NULL in → NULL out (standard unary null semantics).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Shared by interpreted eval and generated code.
    *
    * Pure-ASCII input short-circuits BEFORE the UTF8String→String decode:
    * ASCII is NFC by definition, and `isFullAscii` is a byte scan of the
    * existing buffer — without it every row of an ASCII-heavy corpus paid
    * a full char[] decode + String allocation just to learn it was
    * already normalized. */
  def normalize(s: UTF8String): UTF8String = {
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }

  /** Column wrapper (classic-mode bridge). */
  def nfc(c: Column): Column = Bridge.column(NfcNormalize(Bridge.expression(c)))
}
