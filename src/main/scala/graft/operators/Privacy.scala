package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines: regex-based
  * scrubbing of emails, IPv4 addresses, and phone-shaped numbers from a
  * text column, with per-category hit counts for audit/filter decisions.
  *
  * Scale shape: pure map-side column expressions (`regexp_replace` /
  * `regexp_count` are codegen'd) — a single pass over the corpus, no
  * shuffle, no UDFs. Patterns are RE2-compatible (no lookaround, no
  * backreferences) so the same pattern strings run identically in Spark
  * (java.util.regex) and in RE2-based engines — which is also what keeps
  * the DuckDB oracle an exact mirror.
  *
  * Replacement ORDER matters and is fixed: emails first (their domain part
  * would otherwise partially match the IP pattern), then IPs, then phones.
  */
object Privacy {

  /** (category name, RE2-safe pattern, replacement token). */
  type PiiPattern = (String, String, String)

  /** Default patterns. Deliberately conservative: each shape requires its
    * full anchored-by-\b structure, so free text of words/numbers does not
    * false-positive (pinned in PrivacySpec against the word-bag corpus). */
  val defaultPatterns: Seq[PiiPattern] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ip", """\b(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})(\.(25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})){3}\b""", "<IP>"),
    ("phone", """\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\b""", "<PHONE>"))

  /** Adds `<textCol>_redacted` plus one `n_<category>` BIGINT count column
    * per pattern. Counts are measured on the text as seen by THAT pattern
    * (i.e. after the earlier patterns' replacements), matching what the
    * redaction actually removed. */
  def redactPii(
      df: DataFrame,
      textCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    require(patterns.nonEmpty, "at least one PII pattern required")
    val names = patterns.map(_._1)
    require(names.distinct.size == names.size, s"duplicate PII categories: $names")
    // fold the replacement chain and the count columns in one projection:
    // counts evaluate on the running (partially redacted) text, then the
    // next replacement is applied to it
    val (redacted, counts) =
      patterns.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((cur, acc), (name, pat, repl)) =>
          (regexp_replace(cur, pat, repl),
            acc :+ regexp_count(cur, lit(pat)).cast("long").as(s"n_$name"))
      }
    val newCols: Seq[(String, Column)] =
      (s"${textCol}_redacted" -> redacted) +:
        patterns.zip(counts).map { case ((n, _, _), c) => s"n_$n" -> c }
    df.withColumns(newCols.toMap)
  }

  /** Per-group PII exposure report — the release gate's summary over
    * [[redactPii]]'s per-document counts: for each group (source, lang,
    * snapshot) the document count, total hits per category, how many
    * documents carry ANY PII, and that rate. A source whose pii_rate
    * spikes is the one whose scraper started ingesting contact pages —
    * found here before the redaction bill or the release blocks.
    * Same single map-side regex pass as [[redactPii]], then ONE
    * partial-aggregated groupBy. */
  def piiRates(
      df: DataFrame, textCol: String, groupCol: String,
      patterns: Seq[PiiPattern] = defaultPatterns): DataFrame = {
    val counted = redactPii(df, textCol, patterns)
    val anyPii = patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _)
    counted.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        patterns.map(p => sum(col(s"n_${p._1}")).as(s"n_${p._1}")) :+
          sum(when(anyPii, 1L).otherwise(0L)).as("n_docs_pii"): _*)
      .withColumn("pii_rate",
        round(col("n_docs_pii").cast("double") / col("n_docs"), 6))
  }

  /** k-anonymity audit over a set of quasi-identifier columns: every
    * combination of QI values that fewer than `k` rows share is a
    * re-identification risk (those rows are distinguishable by their QIs
    * alone — the standard privacy gate run before releasing or training on
    * tabular slices). Returns one row per QI combination:
    * (quasiCols..., n BIGINT, at_risk INT 0/1), so callers can both gate
    * (`max(at_risk) = 0` means the release is k-anonymous) and locate the
    * offending groups.
    *
    * NULL is a legitimate QI value and forms its own group — a NULL
    * birthdate still distinguishes a row, so dropping NULL groups would
    * understate risk.
    *
    * Scale shape: ONE partial-aggregated groupBy over the corpus (counts
    * combine map-side); no window, no join, no second pass. The output is
    * |distinct QI combinations| rows — if that itself approaches corpus
    * size, that IS the finding (nearly every row is unique on its QIs). */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity requires at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2 (k=1 marks nothing), got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", when(col("n") < k, 1).otherwise(0))
  }

  /** l-diversity audit — [[kAnonymity]]'s stronger sibling (Machanavajjhala
    * et al., ICDE'06): a quasi-identifier class can be large (k-anonymous)
    * yet still leak when every member shares the same sensitive value, so
    * the per-class guarantee is the number of DISTINCT sensitive values.
    * Returns one row per equivalence class: the quasi columns, `n` (class
    * size), `l_distinct` (distinct sensitive values), and
    * `at_risk = 1` when l_distinct < l. NULL sensitive values do not count
    * toward diversity (countDistinct skips them — an all-NULL class reports
    * l_distinct = 0, maximally at risk, which is the honest reading: the
    * column carries no diversity at all there).
    *
    * Scale shape: ONE exact groupBy on the quasi columns with a
    * count-distinct expand — same single-shuffle shape as [[kAnonymity]];
    * |classes| output rows. */
  def lDiversity(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "lDiversity requires at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(l >= 2, s"l must be >= 2 (l=1 marks nothing), got $l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("at_risk", when(col("l_distinct") < l, 1).otherwise(0))
  }

  /** t-closeness audit — the third of the release triad (Li, Li &
    * Venkatasubramanian, ICDE'07): [[kAnonymity]] bounds
    * re-identification, [[lDiversity]] bounds disclosure by VARIETY, and
    * this bounds it by DISTRIBUTION — an equivalence class whose
    * sensitive values are diverse but heavily skewed away from the
    * corpus-wide distribution still leaks (the classic class with all
    * five diagnoses present but 90% one of them). For a CATEGORICAL
    * sensitive attribute under the paper's unit ground distance, the
    * Earth Mover's Distance equals total variation:
    * `tvd = ½ · Σ_v |p_class(v) − p_global(v)|`.
    *
    * Returns one row per equivalence class: the quasi columns, `n`,
    * `tvd` (rounded to 6), `at_risk = 1` when the ROUNDED tvd exceeds
    * `t` (gating on the rounded value keeps the flag cross-engine
    * stable). NULL sensitive values form their own category — a skewed
    * NULL rate is a disclosure too.
    *
    * Scale shape: ONE partial-aggregated (quasi × sensitive) cell
    * aggregate over the corpus; everything after operates on the
    * |classes·values| cell frame (class totals via a window on it, the
    * ≤|values|-row global distribution broadcast back). Values ABSENT
    * from a class never need a spine join: each contributes
    * `p_global(v)` to the sum, and `Σ_absent p_global = 1 − Σ_present
    * p_global`, so the identity `tvd = ½·(Σ_present |p_c − p_g| + 1 −
    * Σ_present p_g)` folds them in from the present cells alone. */
  def tCloseness(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness requires at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy((quasiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    val global = df.groupBy(col(sensitiveCol).as("__sv"))
      .agg(count(lit(1)).as("__gc"))
      .withColumn("__pg", col("__gc") /
        sum(col("__gc")).over(Window.rowsBetween(Long.MinValue, Long.MaxValue)))
      .select("__sv", "__pg")
    cells
      .withColumn("__n",
        sum(col("__c")).over(Window.partitionBy(quasiCols.map(col): _*)))
      // null-safe: a NULL sensitive category must keep its global prob
      .join(broadcast(global), col(sensitiveCol) <=> col("__sv"))
      .withColumn("__diff", abs(col("__c") / col("__n") - col("__pg")))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        sum(col("__diff")).as("__sd"),
        sum(col("__pg")).as("__sp"))
      .select(quasiCols.map(col) ++ Seq(col("n"),
        round((col("__sd") + (lit(1.0) - col("__sp"))) / 2, 6).as("tvd")): _*)
      .withColumn("at_risk", when(col("tvd") > t, 1).otherwise(0))
  }

  /** t-closeness for a NUMERIC (ordered) sensitive attribute — the paper's
    * ordered-distance EMD (Li, Li & Venkatasubramanian, ICDE'07 §3): where
    * [[tCloseness]]'s unit ground distance treats "salary 3k vs 4k" and
    * "3k vs 11k" as equally distant, the ordered distance charges mass by
    * how FAR along the value spine it must move —
    * `emd = (1/(m−1)) · Σ_{i=1}^{m−1} |Σ_{j≤i} (p_class(v_j) − p_global(v_j))|`
    * over the m distinct global values in ascending order. This is the
    * right audit for salary-style columns, where a class skewed toward
    * adjacent values is far less disclosive than one skewed to an extreme
    * (the paper's worked example: a {3k,4k,5k} class against a uniform
    * 3k–11k global scores 0.375 — pinned in PrivacySpec).
    *
    * Returns one row per equivalence class: the quasi columns, `n` (class
    * size over rows with a non-NULL sensitive value), `emd` (rounded to
    * 6), `at_risk = 1` when the ROUNDED emd exceeds `t`. A single-value
    * domain (m = 1) has no spine to move mass along and scores 0 for every
    * class. NULL sensitive values are EXCLUDED from both distributions —
    * NULL has no position on an ordered spine; a skewed NULL RATE is
    * [[tCloseness]]'s (categorical) disclosure to catch.
    *
    * Scale shape: one (quasi × sensitive) cell aggregate + one
    * ≤|values|-row global spine (its unpartitioned windows run over that
    * bounded frame only), then the class set expands against the
    * broadcast spine — the cumulative sum needs EVERY spine position per
    * class (between two values a class holds, p_global still moves), so
    * unlike the categorical twin absent cells cannot fold away; the
    * intermediate is |classes|·|values| rows, bounded by the audit's own
    * output size times the sensitive cardinality, never by the corpus.
    * The per-class cumsum windows partition by class (≤ m rows each). */
  def tClosenessOrdered(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      t: Double): DataFrame = {
    require(quasiCols.nonEmpty,
      "tClosenessOrdered requires at least one quasi-identifier")
    require(!quasiCols.contains(sensitiveCol),
      s"sensitive column $sensitiveCol cannot also be a quasi-identifier")
    require(t > 0 && t < 1, s"t must be in (0, 1), got $t")
    import org.apache.spark.sql.expressions.Window
    val vals = df.filter(col(sensitiveCol).isNotNull)
      .select(quasiCols.map(col) :+
        col(sensitiveCol).cast("double").as("__v"): _*)
    val all = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    // ≤|values| rows: the unpartitioned windows are deliberate and safe
    val spine = vals.groupBy(col("__v")).agg(count(lit(1)).as("__gc"))
      .select(col("__v"),
        (col("__gc") / sum(col("__gc")).over(all)).as("__pg"),
        row_number().over(Window.orderBy(col("__v"))).as("__pos"),
        count(lit(1)).over(all).as("__m"))
    val cells = vals.groupBy(quasiCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val classes = cells.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("__c")).as("__n"))
    // every class × every spine position; absent cells contribute p_c = 0
    // but still move the cumulative global mass. Null-safe on the quasi
    // keys: a NULL quasi value is a legitimate class (the kAnonymity
    // contract) and a plain equi-join would orphan its cells.
    val cc = cells.select(
      quasiCols.map(c => col(c).as(s"__q_$c")) ++
        Seq(col("__v").as("__cv"), col("__c")): _*)
    val joined = classes.crossJoin(broadcast(spine))
      .join(cc, quasiCols.map(c => col(c) <=> col(s"__q_$c"))
        .reduce(_ && _) && col("__v") === col("__cv"), "left")
    val wcum = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__pos")).rowsBetween(Long.MinValue, 0)
    // the cumsum accumulates in spine order on both engines (the window
    // is sequential), so only the final per-class sum-of-|cum| crosses
    // partial-aggregation order — the established round-6 gate covers it
    joined
      .withColumn("__cum",
        sum(coalesce(col("__c"), lit(0L)) / col("__n") - col("__pg")).over(wcum))
      .groupBy(quasiCols.map(col): _*)
      .agg(max(col("__n")).as("n"),
        round(coalesce(
          sum(when(col("__pos") < col("__m"), abs(col("__cum")))) /
            (max(col("__m")) - 1), lit(0.0)), 6).as("emd"))
      .withColumn("at_risk", when(col("emd") > t, 1).otherwise(0))
  }
}
