package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Text-analysis operators over a document table (SURVEY §7.6): token
  * statistics, quality scoring, language ID, fingerprinting. All map-side
  * column expressions — a single pass over the corpus, no shuffle.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens, distinct tokens, and a BPE-ish
    * regex token count (words + punctuation runs). */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    df.withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("n_bpeish", size(TextFns.bpeishTokens(col(textCol))).cast("long"))
  }

  /** Quality scoring from cheap surface statistics: length band, lexical
    * diversity (type/token ratio), and mean token length band. Weights are
    * fixed, documented, and mirrored in the DuckDB oracle. */
  def withQualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = TextFns.tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val diversity = size(array_distinct(toks)).cast("double") / nTok
    val avgLen = (length(col(textCol)) - (nTok - 1)) / nTok // chars minus separators
    val lenScore = least(nTok / lit(100.0), lit(1.0))
    val avgLenScore = when(avgLen.between(3.0, 8.0), 1.0).otherwise(0.5)
    df.withColumn("quality_score",
      round(lit(0.4) * diversity + lit(0.4) * lenScore + lit(0.2) * avgLenScore, 4))
  }

  /** Language-ID heuristic via stopword-profile voting. */
  def withLangId(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", TextFns.langId(col(textCol), TextFns.defaultProfiles))

  /** Canonical bag-of-words fingerprint + fast 64-bit content hash. */
  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextFns.fingerprint(col(textCol)))
      .withColumn("content_hash", TextFns.contentHash64(col(textCol)))
}
