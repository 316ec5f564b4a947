package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: equi-width histograms and heavy hitters with
  * Count-Min-Sketch validation — the first queries run against a new corpus
  * drop before any curation decision (clip ranges, spam keys, stratum
  * weights).
  */
object Profile {

  /** Equi-width histogram: `nBins` buckets between the column's global min
    * and max; the max value closes into the last bin. NULLs are excluded.
    *
    * Scale shape: one partial-aggregated min/max pass producing a SINGLE
    * row (broadcast back — never collected to a driver loop), then one
    * groupBy on the bin id with map-side combine: two scans, two
    * single-key-space shuffles, no sort. Output is ≤ nBins rows.
    *
    * The bin expression is deliberately written as
    * `floor((x − lo) · nBins / (hi − lo))`, clamped to nBins−1, in exactly
    * that operation order — IEEE double arithmetic is order-sensitive and
    * the DuckDB oracle mirrors the same order token-for-token, so boundary
    * values land in the same bin in both engines. A degenerate column
    * (hi == lo) puts every row in bin 0 instead of dividing by zero. */
  def equiWidthHistogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val x = col(valueCol).cast("double")
    val bounds = df.filter(col(valueCol).isNotNull)
      .agg(min(x).as("__lo"), max(x).as("__hi"))
    df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(
            floor((x - col("__lo")) * nBins / (col("__hi") - col("__lo"))),
            lit(nBins - 1))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Population-stability index between two snapshots of a column — the
    * standard drift monitor run between corpus versions before retraining
    * (PSI < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 retrain-worthy).
    *
    * Bins are equi-width over the REFERENCE side's [min, max] (same FP
    * arithmetic as [[equiWidthHistogram]], so the DuckDB oracle mirrors
    * token-for-token); values of the comparison side outside that range
    * clamp into the edge bins — out-of-range mass IS drift signal and
    * must not be dropped. Each side's bin share is floored at `eps`
    * before the log ratio (the standard empty-bin smoothing: PSI is
    * undefined at p = 0), and per-bin terms round to 4 decimals so the
    * differential is FP-order-stable.
    *
    * Returns one row per occupied bin: (bin, p_ref, p_cmp, psi_term) —
    * `sum(psi_term)` is the PSI. Scale shape: one partial-aggregated
    * groupBy per side over map-side bin expressions, a full-outer join of
    * two ≤nBins-row aggregates, window-sums over those same tiny rows;
    * the snapshots themselves are never joined or windowed. */
  def psiDrift(
      ref: DataFrame, cmp: DataFrame, valueCol: String,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    require(eps > 0, s"eps must be positive, got $eps")
    val x = col(valueCol).cast("double")
    // an empty or all-NULL reference snapshot has no bin bounds: every
    // comparison row would bin to NULL and the result would be a
    // meaningless NULL-bin row set — fail loudly instead (same contract as
    // the engine's other precondition raises), at the first action on the
    // tiny bounds aggregate
    val bounds = ref.filter(col(valueCol).isNotNull)
      .agg(min(x).as("__lo"), max(x).as("__hi"))
      .select(
        when(col("__lo").isNull, raise_error(lit(
          s"psiDrift: reference snapshot has no non-NULL '$valueCol' values — " +
            "bin bounds are undefined; fix the reference feed or column name"))
          .cast("double")).otherwise(col("__lo")).as("__lo"),
        col("__hi"))
    def binned(df: DataFrame, n: String) = df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(greatest(least(
            floor((x - col("__lo")) * nBins / (col("__hi") - col("__lo"))),
            lit(nBins - 1)), lit(0))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val joined = binned(ref, "n_ref").join(binned(cmp, "n_cmp"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cmp"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pRef = greatest(col("n_ref") / sum(col("n_ref")).over(all), lit(eps))
    val pCmp = greatest(col("n_cmp") / sum(col("n_cmp")).over(all), lit(eps))
    joined.select(col("bin"),
        round(pRef, 6).as("p_ref"), round(pCmp, 6).as("p_cmp"))
      .withColumn("psi_term",
        round((col("p_ref") - col("p_cmp")) * log(col("p_ref") / col("p_cmp")), 4))
  }

  /** Physical-partition row counts — the first thing to look at when a
    * stage straggles: one row per Spark partition with its row count.
    * Map-side expression + one tiny aggregate (|partitions| rows); the
    * data itself never reshuffles, so the numbers describe the layout AS
    * EXECUTED, not after a diagnostic repartition. */
  def partitionStats(df: DataFrame): DataFrame =
    df.groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("n_rows"))

  /** One-row skew summary over [[partitionStats]]: partition count,
    * min/max/avg rows, and `skew` = max/avg — the straggler predictor (a
    * perfectly balanced layout scores 1.0; a skew of 10 means the slowest
    * task does 10x the average work and the stage runs at its pace).
    * Empty partitions are invisible to spark_partition_id over rows, so
    * `n_partitions` counts NON-EMPTY partitions; compare with
    * `df.rdd.getNumPartitions` when empty-partition overhead matters. */
  def skewReport(df: DataFrame): DataFrame =
    partitionStats(df).agg(
      count(lit(1)).as("n_partitions"),
      min(col("n_rows")).as("min_rows"),
      max(col("n_rows")).as("max_rows"),
      round(avg(col("n_rows")), 2).as("avg_rows"),
      round(max(col("n_rows")) / avg(col("n_rows")), 2).as("skew"))

  /** Categorical [[psiDrift]]: PSI over a discrete column's value shares
    * (language mix, source mix, label mix between corpus versions) — no
    * binning, each distinct value is its own cell; values present in only
    * one snapshot get the other side's share floored at `eps`, so
    * appearing/disappearing categories surface as large terms instead of
    * being dropped. Same output contract as [[psiDrift]] with the value
    * in place of the bin. NULL is a category here (an encoding change
    * that NULLs a field is exactly the drift to catch) — null-safe
    * full-outer join on the value. */
  def psiDriftCategorical(
      ref: DataFrame, cmp: DataFrame, keyCol: String,
      eps: Double = 1e-6): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val a = ref.groupBy(col(keyCol)).agg(count(lit(1)).as("n_ref"))
    val b = cmp.groupBy(col(keyCol).as("__k")).agg(count(lit(1)).as("n_cmp"))
    val joined = a.join(b, col(keyCol) <=> col("__k"), "full_outer")
      .select(coalesce(col(keyCol), col("__k")).as(keyCol),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cmp"), lit(0L)).as("n_cmp"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val pRef = greatest(col("n_ref") / sum(col("n_ref")).over(all), lit(eps))
    val pCmp = greatest(col("n_cmp") / sum(col("n_cmp")).over(all), lit(eps))
    joined.select(col(keyCol),
        round(pRef, 6).as("p_ref"), round(pCmp, 6).as("p_cmp"))
      .withColumn("psi_term",
        round((col("p_ref") - col("p_cmp")) * log(col("p_ref") / col("p_cmp")), 4))
  }

  /** Equi-DEPTH histogram (quantile binning): `nBins` buckets holding
    * roughly equal row counts, bounded by exact-percentile cut points.
    *
    * Deliberately NOT `ntile` over a global `Window.orderBy` — that window
    * has no partition key, so every row funnels through ONE task (the
    * classic global-sort trap; fine at 60k rows, dead at 100 TB). Instead:
    * one aggregation computes the nBins−1 exact percentile cuts (single
    * row, broadcast back), and each row's bin is the count of cuts
    * strictly below it — a map-side expression. Two scans, no global sort,
    * no single-task stage.
    *
    * Cuts are ROUNDED to 4 decimals before comparing: Spark `percentile`
    * and DuckDB `quantile_cont` agree on linear interpolation only to
    * ~1e-12 ulps, but both engines then compare against the SAME rounded
    * cut, so binning is identical (the rounding equivalence is the
    * already-hash-verified agg_stats pattern). Bins differ from ntile's on
    * heavy ties — cut-bounded bins are the statistically meaningful ones
    * (a value never straddles two bins).
    *
    * `approxAccuracy`: the default exact `percentile` buffers the group's
    * distinct values in the aggregation — fine at fixture scale and
    * required for the engine-exact oracle, but a single-group exact
    * percentile over 100 TB is a memory hazard. Pass
    * `approxAccuracy = Some(n)` to compute the cuts with
    * `percentile_approx` instead (constant-memory sketch, rank error
    * ≤ rows/n) — identical plan shape, bin semantics unchanged, cuts
    * within sketch tolerance (equivalence at the fixture pinned in
    * ProfileSpec). */
  def equiDepthHistogram(
      df: DataFrame, valueCol: String, nBins: Int,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(nBins > 1, s"nBins must be > 1, got $nBins")
    val x = col(valueCol)
    val nonNull = df.filter(x.isNotNull)
    val cutCols = (1 until nBins).map { i =>
      val p = i.toDouble / nBins
      val cut = approxAccuracy match {
        case Some(acc) => percentile_approx(x, lit(p), lit(acc))
        // Column-based, not expr() text: a name like "a-b" would parse as
        // an arithmetic expression, one with spaces wouldn't parse at all
        case None => percentile(x, lit(p))
      }
      round(cut, 4).as(s"__c$i")
    }
    val cuts = nonNull.agg(cutCols.head, cutCols.tail: _*)
    val bin = (1 until nBins).map(i => when(x > col(s"__c$i"), 1).otherwise(0))
      .reduce(_ + _)
    nonNull.crossJoin(broadcast(cuts))
      .withColumn("bin", bin)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min(x).as("lo"), max(x).as("hi"))
  }

  /** One-pass column profile — the ANALYZE-TABLE analog run before any
    * curation decision: per column, total rows, NULL count, and exact
    * distinct count, unpivoted to one row per column.
    *
    * Scale shape: a SINGLE aggregation carries every measure (the multiple
    * exact count-distincts plan as one Expand-based aggregate — one
    * shuffle over the expanded rows, still partial-aggregated map-side),
    * then the 1-row result explodes into |cols| rows driver-free. Counts
    * only, deliberately: min/max would need engine-identical value→string
    * formatting across types, which doubles don't give. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val measures = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__nd_$c"))
    }
    df.agg(measures.head, measures.tail: _*)
      .select(explode(array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          col(s"__nulls_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"))
      }: _*)).as("s"))
      .select("s.*")
  }

  /** Column-level drift between two snapshots of the same table — the
    * schema-health companion to row-level [[graft.operators.Curation.snapshotDiff]]
    * and distribution-level [[psiDrift]]: per profiled column, the row
    * count, null-rate, and distinct-count on each side plus their deltas.
    * A null-rate jumping from 0.001 to 0.4 is an upstream extractor
    * breaking quietly; a distinct-count collapsing to 1 is a constant-fill
    * bug — both invisible to row-diffs when ids keep matching.
    * Returns one row per column:
    * (col_name, n_ref, n_cur, null_rate_ref, null_rate_cur, null_rate_delta,
    *  nd_ref, nd_cur) with rates rounded 6.
    *
    * Scale shape: each snapshot collapses via [[columnProfile]]'s single
    * aggregate pass (one row per side, exploded to |cols|); the join runs
    * over |cols| rows. Snapshots are never joined row-to-row. */
  def schemaDrift(ref: DataFrame, cur: DataFrame, cols: Seq[String]): DataFrame = {
    val r = columnProfile(ref, cols).select(col("col_name"),
      col("n_rows").as("n_ref"), col("n_nulls").as("__nulls_r"),
      col("n_distinct").as("nd_ref"))
    val c = columnProfile(cur, cols).select(col("col_name"),
      col("n_rows").as("n_cur"), col("n_nulls").as("__nulls_c"),
      col("n_distinct").as("nd_cur"))
    val rateR = round(col("__nulls_r").cast("double") / col("n_ref"), 6)
    val rateC = round(col("__nulls_c").cast("double") / col("n_cur"), 6)
    r.join(c, "col_name")
      .select(col("col_name"), col("n_ref"), col("n_cur"),
        rateR.as("null_rate_ref"), rateC.as("null_rate_cur"),
        round(rateC - rateR, 6).as("null_rate_delta"),
        col("nd_ref"), col("nd_cur"))
  }

  /** Per-group exact quantiles: one row per key with a `pNN` column per
    * requested quantile — the per-source length/score distribution check
    * run before any curation threshold is chosen.
    *
    * Scale shape: a single partial-aggregated groupBy carries every
    * quantile; nothing is sorted globally and nothing leaves the
    * executors but the |keys| result rows. The default exact `percentile`
    * buffers each group's values in its aggregation buffer — fine for
    * bounded groups and required for the engine-exact oracle; for 100 TB
    * groups pass `approxAccuracy = Some(n)` to switch to the
    * constant-memory `percentile_approx` sketch (same plan shape, cuts
    * within rank error ≤ rows/n). Quantiles are ROUNDED to 4 decimals —
    * the established cross-engine FP discipline (see
    * [[equiDepthHistogram]]). NULL values are excluded (both engines
    * skip NULLs inside the aggregate; the explicit filter keeps
    * groups that are all-NULL from emitting a NULL-quantile row). */
  def groupQuantiles(
      df: DataFrame, keyCol: String, valueCol: String, ps: Seq[Double],
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1), s"ps must be in (0,1): $ps")
    val x = col(valueCol)
    val aggs = ps.map { p =>
      val q = approxAccuracy match {
        case Some(acc) => percentile_approx(x, lit(p), lit(acc))
        case None => percentile(x, lit(p))
      }
      round(q, 4).as("p" + math.round(p * 100))
    }
    df.filter(x.isNotNull).groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group quantile drift between two snapshots: [[groupQuantiles]]
    * on each side, full-outer-joined on the group key, with per-quantile
    * deltas — the distribution-shift monitor at GROUP granularity where
    * [[psiDrift]]/[[ksDrift]] are corpus-global (a length collapse in one
    * source hides inside a stable global median). Groups present in only
    * one snapshot surface with NULL opposite-side quantiles and NULL
    * deltas — appearing/vanishing groups ARE drift and must not drop.
    *
    * Columns: (key, p{N}_ref, p{N}_cmp, d_p{N} ...) with deltas
    * cmp − ref rounded to 4 (the quantiles themselves already round to 4
    * inside [[groupQuantiles]] — the delta subtracts the ROUNDED values,
    * so the oracle can mirror it exactly). `approxAccuracy` selects the
    * sketch path for both sides at 100 TB, same contract as
    * [[groupQuantiles]]. Scale shape: two per-group aggregation passes
    * (one per snapshot — they are different tables and cannot share a
    * scan) and one equi-join of the two |groups|-row aggregates. */
  def quantileDrift(
      ref: DataFrame, cmp: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[Double], approxAccuracy: Option[Int] = None): DataFrame = {
    val names = ps.map(p => "p" + math.round(p * 100))
    def side(df: DataFrame, suffix: String) =
      names.foldLeft(groupQuantiles(df, keyCol, valueCol, ps, approxAccuracy)) {
        (d, n) => d.withColumnRenamed(n, s"${n}_$suffix")
      }
    val joined = side(ref, "ref").join(side(cmp, "cmp"), Seq(keyCol), "full_outer")
    names.foldLeft(joined) { (d, n) =>
      d.withColumn(s"d_$n", round(col(s"${n}_cmp") - col(s"${n}_ref"), 4))
    }
  }

  /** Per-group Shannon entropy of a categorical column — the composition
    * -diversity profile ("is this source monolingual?", "does one label
    * dominate this shard?"). Returns one row per group:
    * (group, n, n_cats, entropy, evenness) with entropy in nats over the
    * group's category distribution and evenness = entropy / ln(n_cats)
    * (1.0 = perfectly uniform; NULL for single-category groups, where
    * evenness is undefined — 0/0 — and both "maximally even" and
    * "maximally concentrated" would be defensible lies). NULL categories
    * count as a real category, consistent with [[psiDriftCategorical]]:
    * an encoding change that NULLs a field is composition drift.
    *
    * Scale shape: one partial-aggregated groupBy on (group, category),
    * per-group totals aggregated FROM those cells, entropy summed over
    * cells — the corpus is scanned once; everything after is
    * |group × category| rows. Terms are computed in the pinned order
    * −(c/n)·ln(c/n) per cell, summed, then rounded to 6. */
  def groupEntropy(df: DataFrame, groupCol: String, catCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol), col(catCol))
      .agg(count(lit(1)).as("__c"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    cells
      .withColumn("__n",
        sum(col("__c")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__c")).as("n"),
        count(lit(1)).as("n_cats"),
        round(sum(-p * log(p)), 6).as("entropy"))
      .withColumn("evenness",
        when(col("n_cats") > 1,
          round(col("entropy") / log(col("n_cats").cast("double")), 6)))
  }

  /** One-row dataset card — the summary block every corpus release
    * ships: document and token counts, missing-text tally, language and
    * source cardinalities, length quantiles, and the exact-duplicate
    * rate. One number per question a consumer asks before trusting the
    * dataset; the heavyweight audits (drift, dedup, contamination) hang
    * off their own operators.
    *
    * Returns (n_docs, n_null_text, n_tokens, n_langs, n_sources,
    * p50_len, p95_len, n_dup_groups, n_dup_docs, dup_rate).
    * `n_dup_groups` counts content-hash groups holding >1 doc;
    * `n_dup_docs` counts the docs beyond each group's first (what exact
    * dedup would remove); `dup_rate` = n_dup_docs / n_docs (round 6).
    *
    * Scale shape: one partial-aggregated pass over the corpus for the
    * scalar stats + one md5-keyed groupBy for the duplicate tally
    * collapsed to a 1-row aggregate — two corpus scans, both shuffling
    * only 16-byte hashes or nothing, joined as 1-row broadcasts. */
  def datasetCard(
      df: DataFrame, idCol: String, textCol: String,
      langCol: String, sourceCol: String): DataFrame = {
    val toks = size(split(col(textCol), " "))
    val stats = df.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col(textCol).isNull, 1L).otherwise(0L)).as("n_null_text"),
      sum(when(col(textCol).isNotNull, toks.cast("long")).otherwise(0L)).as("n_tokens"),
      countDistinct(col(langCol)).as("n_langs"),
      countDistinct(col(sourceCol)).as("n_sources"),
      round(percentile(length(col(textCol)).cast("double"), lit(0.5)), 4).as("p50_len"),
      round(percentile(length(col(textCol)).cast("double"), lit(0.95)), 4).as("p95_len"))
    val dups = df.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("__h")).agg(count(lit(1)).as("__n"))
      .agg(
        sum(when(col("__n") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(when(col("__n") > 1, col("__n") - 1).otherwise(0L)).as("n_dup_docs"))
    stats.crossJoin(broadcast(dups))
      .withColumn("n_dup_groups", coalesce(col("n_dup_groups"), lit(0L)))
      .withColumn("n_dup_docs", coalesce(col("n_dup_docs"), lit(0L)))
      .withColumn("dup_rate",
        when(col("n_docs") > 0,
          round(col("n_dup_docs").cast("double") / col("n_docs"), 6)))
  }

  /** Per-group Gini coefficient of a value column — the concentration
    * metric for corpus composition questions ("does one source's token
    * mass sit in a handful of giant documents?"): 0 = perfectly even,
    * →1 = one row holds everything. Uses the rank identity
    * `G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n` over ascending-ranked values, so
    * everything up to the final division is EXACT integer arithmetic —
    * no FP accumulation to disagree across engines; the quotient rounds
    * at 6. Returns (keyCol, n, gini); NULL values are excluded; groups
    * whose values sum to 0 have no mass to concentrate and report NULL;
    * ranks tie-break on the id column, which cannot change the sum
    * (equal values commute under i·xᵢ) but pins a deterministic plan.
    *
    * Scale shape: ONE window shuffle on the group key for the rank
    * (partition = one group's rows), then a partial-aggregated rollup on
    * the same key. Negative values violate the Gini domain and fail
    * loudly rather than returning a nonsense coefficient. */
  def groupGini(df: DataFrame, keyCol: String, valueCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the exact-arithmetic claim rests on integer inputs: silently
    // long-truncating a fractional score column would report nonsense
    // (every sub-1.0 value truncates to 0) — reject at construction; a
    // caller with fractional mass scales to a fixed-point integer first
    val dt = df.schema(valueCol).dataType
    require(Set("long", "integer", "short", "byte").contains(dt.typeName),
      s"groupGini needs an integral $valueCol (got ${dt.typeName}); " +
        "scale fractional mass to fixed-point first")
    val x = col(valueCol).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(x.asc, col(idCol).asc_nulls_last)
    df.filter(x.isNotNull)
      .withColumn("__x",
        when(x < 0, raise_error(concat(lit(
          s"groupGini: negative $valueCol breaks the Gini domain: "), x.cast("string"))))
          .otherwise(x))
      .withColumn("__i", row_number().over(w).cast("long"))
      .groupBy(col(keyCol))
      // the rank-weighted sum is ~n²·x̄/2 per group: a LONG accumulator
      // overflows near 10⁸ docs × 10³ mass (ANSI kills the job; non-ANSI
      // silently wraps, while the DuckDB oracle's HUGEINT sails on) —
      // decimal(38,0) keeps the arithmetic exact to corpus scale. n·Σx in
      // the denominator has the same bound, so it widens too.
      // __sx widens too: a group's TOTAL mass can pass 2⁶³ on its own
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).as("__sx"),
        // widen BEFORE the product too: i·x itself can pass 2⁶³ when both
        // rank and mass run large
        sum(col("__i").cast("decimal(38,0)") * col("__x")).as("__six"))
      .select(col(keyCol), col("n"),
        when(col("__sx") > 0,
          round(lit(2.0) * col("__six") /
            (col("n").cast("decimal(38,0)") * col("__sx")) -
            (col("n") + 1).cast("double") / col("n"), 6)).as("gini"))
  }

  /** Equi-depth bin assignment per ROW: each value gets its quantile bin
    * index in [0, nBins) — the rank-based feature transform (length
    * deciles for stratified mixing, score quartiles for curriculum
    * ordering) that is robust to scale and outliers where equal-width
    * bins are not. Adds `<valueCol>_bin` (INT); NULL values get a NULL
    * bin.
    *
    * Scale shape: the nBins−1 cuts are ONE aggregate row broadcast back;
    * the assignment is a map-side count of cuts ≤ value — the corpus is
    * scanned twice, shuffled never (same shape as [[winsorize]]).
    * Determinism: cuts are rounded to 4 decimals BEFORE comparison —
    * interpolated cut doubles can differ across engines at the ULP, and
    * an unrounded cut sitting ULP-below an integer data value would flip
    * that value's bin per engine. `approxAccuracy` switches to the
    * constant-memory sketch for unbounded inputs. */
  def withQuantileBin(
      df: DataFrame, valueCol: String, nBins: Int,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    val ps = (1 until nBins).map(_.toDouble / nBins)
    val x = col(valueCol).cast("double")
    val q = approxAccuracy match {
      case Some(acc) => percentile_approx(x, array(ps.map(lit): _*), lit(acc))
      case None => percentile(x, array(ps.map(lit): _*))
    }
    val cuts = df.filter(x.isNotNull)
      .agg(transform(q, c => round(c, 4)).as("__cuts"))
    df.crossJoin(broadcast(cuts))
      .withColumn(s"${valueCol}_bin",
        when(x.isNotNull, size(filter(col("__cuts"), c => c <= x)).cast("int")))
      .drop("__cuts")
  }

  /** Lorenz curve over equi-depth value bins: sort the population into
    * `nBins` quantile bins of the value column ([[withQuantileBin]]'s
    * cuts) and report each bin's share of the TOTAL value mass plus the
    * cumulative share — the concentration staircase behind "the top
    * decile of orders carries 28% of revenue" and the curve a Gini
    * coefficient summarizes ([[groupGini]] is the one-number twin).
    *
    * Returns (bin, n, mass, share, cum_share), bin ascending by value.
    * Numeric contract — mass is fixed-pointed to CENTS (×100, rounded to
    * a LONG) before summation: per-bin double sums at corpus scale
    * accumulate order-dependent error larger than any safe rounding
    * gate, while integer sums are exact and every published ratio is
    * then ONE IEEE division of exact integers — bit-identical across
    * engines, no gate (same doctrine as [[groupGini]]). `mass` itself is
    * the exact cent sum divided once by 100. Values must be
    * non-negative (a Lorenz curve of mixed-sign mass is undefined) —
    * negatives fail loudly.
    *
    * Scale shape: one percentile-cut aggregate broadcast back
    * ([[withQuantileBin]] — approx path available for 100 TB), one
    * partial-aggregated groupBy on the ≤nBins bin key, windows over the
    * nBins-row aggregate only. */
  def lorenzCurve(
      df: DataFrame, valueCol: String, nBins: Int = 10,
      approxAccuracy: Option[Int] = None): DataFrame = {
    val x = col(valueCol).cast("double")
    val guarded = when(x < 0, raise_error(concat(
        lit(s"lorenzCurve: negative $valueCol breaks the Lorenz domain: "),
        x.cast("string"))).cast("double")).otherwise(x)
    val binned = withQuantileBin(df.filter(x.isNotNull), valueCol, nBins,
      approxAccuracy)
    val agg = binned
      .groupBy(col(s"${valueCol}_bin").as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(round(guarded * 100, 0).cast("long")).as("__cents"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = org.apache.spark.sql.expressions.Window
      .orderBy("bin").rowsBetween(Long.MinValue, 0)
    agg
      .withColumn("__total", sum(col("__cents")).over(all))
      .withColumn("__cum", sum(col("__cents")).over(cum))
      .select(col("bin"), col("n"),
        (col("__cents").cast("double") / 100).as("mass"),
        (col("__cents").cast("double") / col("__total")).as("share"),
        (col("__cum").cast("double") / col("__total")).as("cum_share"))
  }

  /** ABC contribution classes: label each entity A/B/C by whether it sits
    * in the head that carries `aCut` of total value mass (A), the next
    * band up to `bCut` (B), or the tail (C) — the classic inventory /
    * revenue-concentration segmentation ("which 20% of customers carry
    * 80% of revenue?"). Returns (key, mass_cents, bin, abc_class).
    *
    * Scale shape — exact ABC needs a mass-sorted cumulative over ALL
    * entities (a single-task global window at 10⁹ entities); this is the
    * BINNED formulation: entities aggregate to exact fixed-point mass
    * (cents, the [[lorenzCurve]] doctrine), quantile cuts bin them
    * (approx-sketch path available), the cumulative runs over the ≤nBins
    * aggregate rows DESCENDING, each bin gets the class its cumulative
    * prefix earns, and entities inherit their bin's class via one
    * broadcast join. Boundary granularity is one bin: every entity in
    * the bin where the `aCut` line crosses is classed A — raise `nBins`
    * to tighten. Cut comparisons are exact-long vs one double product
    * (aCut·total), deterministic cross-engine. Negative values fail
    * loudly (mass classes over mixed-sign value are undefined). */
  def abcClasses(
      df: DataFrame, keyCol: String, valueCol: String,
      nBins: Int = 20, aCut: Double = 0.8, bCut: Double = 0.95,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(aCut > 0 && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1, got ($aCut, $bCut)")
    val x = col(valueCol).cast("double")
    val guarded = when(x < 0, raise_error(concat(
        lit(s"abcClasses: negative $valueCol breaks the mass-class domain: "),
        x.cast("string"))).cast("double")).otherwise(x)
    val perKey = df.filter(x.isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(round(guarded * 100, 0).cast("long")).as("mass_cents"))
    val binned = withQuantileBin(perKey, "mass_cents", nBins, approxAccuracy)
      .withColumnRenamed("mass_cents_bin", "bin")
    val bins = binned.groupBy("bin").agg(sum(col("mass_cents")).as("__m"))
    val desc = org.apache.spark.sql.expressions.Window
      .orderBy(col("bin").desc)
    val prev = sum(col("__m")).over(desc.rowsBetween(Long.MinValue, -1))
    val total = sum(col("__m")).over(desc.rowsBetween(Long.MinValue, Long.MaxValue))
    val classes = bins
      .withColumn("abc_class",
        when(prev.isNull || prev.cast("double") < lit(aCut) * total, "A")
          .when(prev.cast("double") < lit(bCut) * total, "B")
          .otherwise("C"))
      .select("bin", "abc_class")
    binned.join(broadcast(classes), "bin")
      .select(col(keyCol), col("mass_cents"), col("bin"), col("abc_class"))
  }

  /** Seasonal anomaly scan: each hour-slot's event count scored against
    * the baseline of OTHER observations of the same (day-of-week ×
    * hour-of-day) cell — "is this Tuesday 3am unusual FOR a Tuesday
    * 3am?", the question a flat threshold ([[graft.operators.Events.rateAnomalies]])
    * cannot ask on traffic with a weekly shape. Returns one row per
    * hour slot: (slot, dow, hod, n, k, z) where k is the cell's
    * observation count and z the slot's deviation in cell σ units.
    *
    * Numeric contract (the [[graft.operators.Events.burstiness]]
    * doctrine): counts are exact integers, and (k·x − s)/(k·σ) with
    * σ² = (k·Σx² − (Σx)²)/k² algebraically reduces to
    * (k·x − s) / √(k·Σx² − (Σx)²) — ONE sqrt of an exact integer and
    * ONE division, bit-identical across engines, no rounding gate. Slots in cells observed once (k = 1) or
    * with zero variance report NULL z — "no baseline" must not alias
    * "exactly at baseline". The slot's own value stays IN its cell's
    * baseline (standard population z; at k ≥ 4 the self-inclusion bias
    * is < σ/4 and leave-one-out would break the exact-integer form).
    *
    * Scale shape: the corpus collapses to per-slot counts first (one
    * partial-aggregated groupBy, |hours| rows), cells aggregate FROM
    * slots (≤168 rows), and the join back is slot-to-cell on the tiny
    * cell table — broadcast, no second corpus scan. */
  def seasonalAnomaly(df: DataFrame, tsCol: String): DataFrame = {
    val slots = df
      .groupBy(date_trunc("hour", col(tsCol)).as("slot"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("slot")))
      .withColumn("hod", hour(col("slot")))
    slots.join(broadcast(seasonalCells(df, tsCol)), Seq("dow", "hod"))
      .withColumn("z", seasonalZ)
      .select("slot", "dow", "hod", "n", "k", "z")
  }

  /** The (dow × hod) baseline table [[seasonalAnomaly]] scores against:
    * (dow, hod, k, s_n, sq_n) — observation count and exact integer
    * Σn / Σn² per cell. Train it on the batch corpus and persist it; the
    * streaming scorer ([[graft.streaming.EventStreams.seasonalScore]])
    * broadcast-joins arriving closed hour windows against it. */
  def seasonalCells(df: DataFrame, tsCol: String): DataFrame =
    df.groupBy(date_trunc("hour", col(tsCol)).as("slot"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("slot")))
      .withColumn("hod", hour(col("slot")))
      .groupBy("dow", "hod")
      .agg(count(lit(1)).as("k"),
        sum(col("n")).as("s_n"),
        sum(col("n") * col("n")).as("sq_n"))

  /** The ONE z expression both the batch scan and the streaming scorer
    * apply over (n, k, s_n, sq_n) — shared so the score arithmetic
    * cannot drift between the two paths (the bm25ScoreExpr discipline). */
  private[graft] def seasonalZ: Column = {
    val m2 = col("k") * col("sq_n") - col("s_n") * col("s_n")
    when(col("k") > 1 && m2 > 0,
      (col("k") * col("n") - col("s_n")).cast("double")
        / sqrt(m2.cast("double")))
  }

  /** Seasonal VALUE anomaly: each hour-slot's metric SUM (revenue,
    * payload bytes — any money-like column) scored against its
    * (day-of-week × hour-of-day) cell baseline — [[seasonalAnomaly]]'s
    * twin for the questions volume alone can't answer ("traffic is
    * normal but revenue collapsed this Tuesday 3am"). Returns one row
    * per hour slot: (slot, dow, hod, sum_cents, k, z).
    *
    * Numeric contract: values fix-point to cents (×100, LONG — the
    * [[lorenzCurve]] doctrine), so per-slot sums are exact integers and
    * z = (k·x − S) / √(k·ΣX² − S²) is exact-integer arithmetic into one
    * sqrt and one division — bit-identical cross-engine, no gates. The
    * squared terms widen to decimal(38,0) before multiplying (a slot sum
    * past ~3·10⁹ cents would overflow a LONG square; the groupGini
    * precedent), converging with DuckDB's automatic HUGEINT on the same
    * exact integers. Singleton/zero-variance cells report NULL z.
    * Negative values are allowed (refunds are real revenue events). */
  def seasonalValueAnomaly(
      df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol).cast("double") * 100, 0).cast("long")
    val slots = df.filter(col(valueCol).isNotNull)
      .groupBy(date_trunc("hour", col(tsCol)).as("slot"))
      .agg(sum(cents).as("sum_cents"))
      .withColumn("dow", dayofweek(col("slot")))
      .withColumn("hod", hour(col("slot")))
    val x = col("sum_cents").cast("decimal(38,0)")
    val cells = slots.groupBy("dow", "hod")
      .agg(count(lit(1)).as("k"),
        sum(x).as("__s"),
        sum(x * x).as("__sq"))
    val m2 = col("k") * col("__sq") - col("__s") * col("__s")
    slots.join(broadcast(cells), Seq("dow", "hod"))
      .withColumn("z",
        when(col("k") > 1 && m2 > 0,
          (col("k") * col("sum_cents").cast("decimal(38,0)") - col("__s"))
            .cast("double") / sqrt(m2.cast("double"))))
      .select("slot", "dow", "hod", "sum_cents", "k", "z")
  }

  /** Robust per-group z-score via median/MAD — the heavy-tail-safe twin
    * of mean/std standardization ([[standardize]]): document-length and
    * score columns are routinely long-tailed, where a handful of outliers
    * inflate the std enough to hide every other outlier; the median and
    * the median-absolute-deviation are unmoved by them.
    * `robust_z = 0.6745 · (x − median) / MAD` (0.6745 scales MAD to σ
    * under normality, the standard convention). Adds `<valueCol>_rz`
    * (DOUBLE, rounded 4). NULL values stay NULL; groups with MAD = 0
    * (over half the group at one value) yield NULL — an honest "no
    * spread to standardize against", never ±Inf.
    *
    * Scale shape: the corpus is scanned twice and shuffled never — the
    * medians are one [[groupQuantiles]] pass (|keys| rows, broadcast
    * back), the MADs one more over the residuals, then the z is map-side.
    * Exact medians by default; pass `approxAccuracy` for unbounded
    * groups, same knob as every quantile op here. */
  def robustZ(
      df: DataFrame, keyCol: String, valueCol: String,
      approxAccuracy: Option[Int] = None): DataFrame = {
    val med = groupQuantiles(df, keyCol, valueCol, Seq(0.5), approxAccuracy)
      .select(col(keyCol), col("p50").as("__med"))
    val withMed = df.join(broadcast(med), Seq(keyCol))
    val mad = groupQuantiles(
      withMed.select(col(keyCol),
        abs(col(valueCol) - col("__med")).as("__absdev")),
      keyCol, "__absdev", Seq(0.5), approxAccuracy)
      .select(col(keyCol), col("p50").as("__mad"))
    withMed.join(broadcast(mad), Seq(keyCol))
      .withColumn(s"${valueCol}_rz",
        when(col("__mad") > 0,
          round(lit(0.6745) * (col(valueCol) - col("__med")) / col("__mad"), 4)))
      .drop("__med", "__mad")
  }

  /** Chi-square contingency table over two categorical columns: per
    * (a, b) cell the observed count, the independence-expected count
    * (row-total × col-total / N), and the cell's chi-square contribution
    * ((obs − exp)² / exp) — the corpus-composition skew check (is language
    * independent of source, or does one source dominate a language?).
    * Summing `chi2` over cells gives the test statistic.
    *
    * Scale shape: one partial-aggregated groupBy on (a, b) — output
    * bounded by the category-pair cardinality — then the marginals are
    * two aggregations OVER THE CELL COUNTS (never re-scanning the
    * corpus), joined back by their single keys; N rides in as a broadcast
    * 1-row aggregate. Expected/chi2 doubles are computed in the same
    * operation order as the DuckDB oracle and rounded to 4 decimals.
    * NULL categories are EXCLUDED from the output: the marginal joins
    * below are plain equality joins and NULL never equals NULL, so a
    * NULL-keyed cell finds no row/column total and drops (the DuckDB
    * oracle's JOIN USING behaves identically, so both engines agree).
    * Callers wanting NULL as a real category should fill a sentinel
    * first (the registered query's fixture has no NULLs). */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col(aCol)).agg(sum(col("obs")).as("__rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum(col("obs")).as("__ct"))
    val n = cells.agg(sum(col("obs")).cast("double").as("__n"))
    val e = col("__rt").cast("double") * col("__ct").cast("double") / col("__n")
    cells.join(rowT, aCol).join(colT, bCol)
      .crossJoin(broadcast(n))
      .withColumn("expected", round(e, 4))
      .withColumn("chi2", round(
        (col("obs").cast("double") - e) * (col("obs").cast("double") - e) / e, 4))
      .select(col(aCol), col(bCol), col("obs"), col("expected"), col("chi2"))
  }

  /** Functional-dependency audit: does `det` (a determinant column set)
    * uniquely determine `dep`? The schema-discovery / data-contract check
    * run before trusting a column as a lookup key, a dedup survivor
    * authority, or an SCD2 natural key — one row per determinant value
    * with (n_rows, n_dep, n_null_dep, violated): `n_dep` counts DISTINCT
    * non-NULL dependent values (more than one = the FD is violated for
    * that group), `n_null_dep` surfaces NULL dependents separately (NULL
    * is missing data, not a distinct value — counting it as one would
    * flag a half-loaded table as a dependency violation).
    *
    * Scale shape: ONE groupBy over the determinant columns; count and the
    * NULL tally combine map-side, count(DISTINCT dep) is Spark's standard
    * two-phase expand — no join, no window, no second scan. The output is
    * |distinct det values| rows; if that approaches corpus size the
    * determinant is nearly unique and the audit says so by its row count. */
  def fdAudit(df: DataFrame, det: Seq[String], dep: String): DataFrame = {
    require(det.nonEmpty, "fdAudit requires at least one determinant column")
    require(!det.contains(dep), s"dependent column $dep cannot be its own determinant")
    df.groupBy(det.map(col): _*)
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col(dep)).as("n_dep"),
        sum(when(col(dep).isNull, 1L).otherwise(0L)).as("n_null_dep"))
      .withColumn("violated", when(col("n_dep") > 1, 1).otherwise(0))
  }

  /** Winsorize: clip a value column to its own group's [pLo, pHi]
    * quantiles — the outlier-trimming step run before any mean/variance
    * statistic or length-based mixing weight is computed from heavy-tailed
    * document measures. Adds `<valueCol>_clipped` (DOUBLE, rounded to 4
    * decimals per the cross-engine FP discipline); NULL values stay NULL;
    * rows whose group has no non-NULL values are dropped with the inner
    * join (there is no quantile to clip against).
    *
    * Scale shape: the cuts are one [[groupQuantiles]] pass (|keys| rows,
    * broadcast back), then the clip is a map-side least/greatest — the
    * corpus is scanned twice and shuffled never. `approxAccuracy` passes
    * through for unbounded groups. */
  def winsorize(
      df: DataFrame, keyCol: String, valueCol: String,
      pLo: Double = 0.01, pHi: Double = 0.99,
      approxAccuracy: Option[Int] = None): DataFrame = {
    require(pLo < pHi, s"need pLo < pHi, got $pLo >= $pHi")
    val loName = "p" + math.round(pLo * 100)
    val hiName = "p" + math.round(pHi * 100)
    require(loName != hiName, s"pLo and pHi round to the same column $loName")
    val cuts = groupQuantiles(df, keyCol, valueCol, Seq(pLo, pHi), approxAccuracy)
      .select(col(keyCol), col(loName).as("__lo"), col(hiName).as("__hi"))
    val x = col(valueCol)
    df.join(broadcast(cuts), keyCol)
      .withColumn(s"${valueCol}_clipped",
        when(x.isNotNull,
          round(least(greatest(x.cast("double"), col("__lo")), col("__hi")), 4)))
      .drop("__lo", "__hi")
  }

  /** Pre-flight equi-join size estimate — the "will this join explode?"
    * check run BEFORE submitting a 100 TB join: the textbook
    * System-R cardinality model `|A ⋈ B| ≈ n_a · n_b / max(d_a, d_b)`
    * (uniformity + containment assumptions), reported alongside its
    * inputs so the caller can also see the per-key fanout
    * `n/d` on each side (fanouts multiply — two 100x-fanout sides mean a
    * 10,000x row blowup even when the estimate "fits"). Returns one row:
    * (n_a, n_b, d_a, d_b, est_rows). NULL keys never join, so both the
    * counts and the distincts exclude rows with any NULL key part.
    *
    * `approx = true` swaps exact count_distinct for the HLL++ sketch
    * (same single-pass shape, a fraction of the shuffle) — the setting
    * for genuinely large inputs; exact is the oracle baseline. Scale
    * shape: ONE aggregation pass per side, no join is executed. */
  def joinEstimate(
      a: DataFrame, b: DataFrame, keys: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "joinEstimate requires at least one key column")
    def side(df: DataFrame, nAs: String, dAs: String) = {
      val allPresent = keys.map(col(_).isNotNull).reduce(_ && _)
      val keyStruct = when(allPresent, struct(keys.map(col): _*))
      val d =
        if (approx) approx_count_distinct(keyStruct)
        else count_distinct(keyStruct)
      df.agg(sum(when(allPresent, 1L).otherwise(0L)).as(nAs), d.as(dAs))
    }
    side(a, "n_a", "d_a").crossJoin(side(b, "n_b", "d_b"))
      .select(
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("d_a"), col("d_b"),
        when(greatest(col("d_a"), col("d_b")) > 0,
          // the product runs in DOUBLE: two multi-billion-row sides
          // overflow a long product (ANSI mode would make the pre-flight
          // check itself crash on exactly the inputs it exists to vet);
          // an estimate loses nothing to double precision
          floor(col("n_a").cast("double") * col("n_b").cast("double") /
            greatest(col("d_a"), col("d_b")))
            .cast("long"))
          .otherwise(lit(0L)).as("est_rows"))
  }

  /** Per-group z-score standardization: append
    * `<valueCol>_z = (x − μ_g) / σ_g` using each row's OWN group's
    * moments — the feature-scaling step before any cross-strata comparison
    * of heavy-tailed document measures (a global z-score would let the
    * dominant stratum's moments define "normal" for everyone). σ is the
    * SAMPLE stddev (n−1); single-row and constant groups have σ = 0/NULL
    * and z stays NULL (no meaningful deviation exists — mirroring SQL).
    * NULL values stay NULL. Rounded to 4 decimals per the cross-engine FP
    * discipline.
    *
    * Scale shape: one partial-aggregated moments pass (|groups| rows,
    * broadcast back) + a map-side expression — scanned twice, shuffled
    * never; same plan family as [[winsorize]]. */
  def standardize(
      df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val moments = df.groupBy(col(keyCol)).agg(
      avg(x).as("__mu"), stddev_samp(x).as("__sigma"))
    // LEFT join: a NULL group key finds no moments row and the z stays
    // NULL, but the ROW passes through — this is an append-a-column
    // transform and must never drop rows (contrast: winsorize's inner
    // join documents its row-dropping explicitly)
    df.join(broadcast(moments), Seq(keyCol), "left")
      .withColumn(s"${valueCol}_z",
        when(x.isNotNull && col("__sigma").isNotNull && col("__sigma") =!= 0.0,
          round((x - col("__mu")) / col("__sigma"), 4)))
      .drop("__mu", "__sigma")
  }

  /** Per-group quantile gate: keep rows whose value sits at or above
    * their OWN group's q-quantile — "keep the top (1−q) share by quality
    * per language", the standard per-stratum quality cut (a single global
    * threshold would gut low-resource strata whose score distribution
    * sits lower). Rows with a NULL value drop (no comparison), and groups
    * with no non-NULL values drop with the inner join, mirroring
    * [[winsorize]]'s contract. Cuts are rounded to 4 decimals (the
    * cross-engine FP discipline), and both engines compare against the
    * same rounded cut.
    *
    * Scale shape: one [[groupQuantiles]] pass (|keys| rows, broadcast
    * back) + a map-side filter — the corpus is scanned twice, shuffled
    * never. `approxAccuracy` switches to the sketch percentile for
    * unbounded groups. */
  def filterByGroupQuantile(
      df: DataFrame, keyCol: String, valueCol: String, q: Double,
      approxAccuracy: Option[Int] = None): DataFrame = {
    val cutName = "p" + math.round(q * 100)
    val cuts = groupQuantiles(df, keyCol, valueCol, Seq(q), approxAccuracy)
      .select(col(keyCol), col(cutName).as("__cut"))
    df.join(broadcast(cuts), keyCol)
      .filter(col(valueCol).cast("double") >= col("__cut"))
      .drop("__cut")
  }

  /** Deterministic k-per-group sample: within each stratum, keep the k
    * rows with the smallest md5(id) draw — a hash-stable balanced subset
    * (the class-balancing companion to [[Curation.stratifiedSample]]'s
    * rate-based sampling): reproducible across runs, cluster sizes, and
    * row orders, and a kept row stays kept when the corpus grows unless a
    * smaller draw displaces it.
    *
    * Scale shape: `row_number ≤ k` over the stratum window is rewritten
    * by WindowGroupLimit (asserted in PlanSpec), so map tasks forward at
    * most k rows per group to the shuffle — the window never sees full
    * groups. The id tie-break keeps the selection total even under md5
    * collisions. */
  def sampleKPerGroup(
      df: DataFrame, idCol: String, stratumCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Exact heavy hitters: keys occurring at least `minCount` times. One
    * shuffle with map-side partial aggregation; output bounded by
    * N/minCount keys regardless of corpus size. */
  def heavyHitters(df: DataFrame, keyCol: String, minCount: Long): DataFrame = {
    require(minCount > 0, s"minCount must be positive, got $minCount")
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
  }

  /** [[heavyHitters]] plus a Count-Min-Sketch cross-check: builds a CMS
    * over the key column (constant memory — width ⌈2/eps⌉ × depth
    * ⌈ln(1/(1−confidence))⌉ counters, merged tree-wise across partitions)
    * and flags each heavy key with whether the sketch estimate honors the
    * CMS contract: `cnt ≤ est ≤ cnt + ⌈eps·N⌉` (over-estimates only, by at
    * most eps·N with probability ≥ confidence per key). `cms_ok` = 1 is
    * the driver-visible differential for the sketch path; the exact counts
    * are the oracle-checkable part.
    *
    * The CMS is the 100 TB point-query path — frequency of ONE key without
    * the groupBy — and this operator is its accuracy harness over the keys
    * that matter most (the heavy ones, where relative error is smallest).
    * Keys are sketched as strings (cast once on both build and probe) so
    * any orderable key type gets identical hashing. NULL keys are excluded
    * on BOTH sides (a NULL cannot be sketched — estimating it would NPE;
    * excluding it from the exact side too keeps the sides comparable. A
    * heavily-NULL key column is a data-quality finding for
    * [[columnProfile]], not a frequency one). The sketch itself is
    * driver-held and broadcast — bounded by (eps, confidence), never by
    * data size. Deterministic for a fixed seed. */
  def heavyHittersChecked(
      df: DataFrame,
      keyCol: String,
      minCount: Long,
      eps: Double = 5e-4,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("__k"))
      .filter(col("__k").isNotNull)
    val cms = keyed.stat.countMinSketch("__k", eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val bcast = df.sparkSession.sparkContext.broadcast(cms)
    val est = udf((k: String) => bcast.value.estimateCount(k))
    heavyHitters(df.filter(col(keyCol).isNotNull), keyCol, minCount)
      .withColumn("__est", est(col(keyCol).cast("string")))
      .select(col(keyCol), col("cnt"),
        when(col("__est") >= col("cnt") && col("__est") <= col("cnt") + slack, 1)
          .otherwise(0).as("cms_ok"))
  }

  /** Binned two-sample Kolmogorov–Smirnov drift check — the companion to
    * [[psiDrift]] for the cases PSI under-reads: KS is the max vertical
    * gap between the two empirical CDFs, so a shift concentrated in one
    * tail (which spreads thinly over many PSI bins) still produces one
    * large cumulative gap. Run both before a retrain decision; they
    * disagree exactly when the drift is localized.
    *
    * Binning follows the [[psiDrift]] contract: equi-width over the
    * REFERENCE side's [min, max] (same deliberate FP operation order, so
    * the DuckDB oracle mirrors token-for-token), comparison values outside
    * the range clamp into the edge bins (out-of-range mass IS signal), an
    * empty/all-NULL reference fails loudly. The statistic is exact for the
    * binned distributions and approximates the unbinned KS to within the
    * largest single-bin mass — raise `nBins` to tighten; the unbinned
    * exact KS needs a global sort of both snapshots, which is the
    * 100 TB-hostile shape this operator exists to avoid.
    *
    * Returns one row per bin: (bin, cum_p_ref, cum_p_cmp, ks_term) where
    * `ks_term = |cum_p_ref − cum_p_cmp|`; `max(ks_term)` is the KS
    * statistic. Scale shape: one partial-aggregated groupBy per side, a
    * full-outer join of two ≤nBins-row aggregates, cumulative windows
    * over those same tiny rows — the snapshots are never joined, sorted
    * globally, or windowed. */
  def ksDrift(
      ref: DataFrame, cmp: DataFrame, valueCol: String,
      nBins: Int = 100): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val x = col(valueCol).cast("double")
    val bounds = ref.filter(col(valueCol).isNotNull)
      .agg(min(x).as("__lo"), max(x).as("__hi"))
      .select(
        when(col("__lo").isNull, raise_error(lit(
          s"ksDrift: reference snapshot has no non-NULL '$valueCol' values — " +
            "bin bounds are undefined; fix the reference feed or column name"))
          .cast("double")).otherwise(col("__lo")).as("__lo"),
        col("__hi"))
    def binned(df: DataFrame, n: String) = df.filter(col(valueCol).isNotNull)
      .crossJoin(broadcast(bounds))
      .select(
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(greatest(least(
            floor((x - col("__lo")) * nBins / (col("__hi") - col("__lo"))),
            lit(nBins - 1)), lit(0))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val joined = binned(ref, "n_ref").join(binned(cmp, "n_cmp"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cmp"))
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = org.apache.spark.sql.expressions.Window
      .orderBy("bin").rowsBetween(Long.MinValue, 0)
    // cumulative shares round to 6 BEFORE the gap so the per-row values
    // and the gap reproduce bit-identically in the oracle's window sums
    joined.select(col("bin"),
        round(sum(col("n_ref")).over(cum) / sum(col("n_ref")).over(all), 6)
          .as("cum_p_ref"),
        round(sum(col("n_cmp")).over(cum) / sum(col("n_cmp")).over(all), 6)
          .as("cum_p_cmp"))
      .withColumn("ks_term", round(abs(col("cum_p_ref") - col("cum_p_cmp")), 6))
  }

  /** Benford first-digit audit over a positive numeric column: observed
    * share of each leading significant digit vs the Benford expectation
    * log10(1 + 1/d) — the classic fabricated-or-truncated-data smell test
    * for financial-style magnitude columns (synthetic or clipped feeds
    * flatten the curve; genuine multi-scale data follows it).
    *
    * The leading digit is computed arithmetically — floor(x / 10^floor(
    * log10 x)) — NOT by string formatting: double→string rendering
    * differs between engines (scientific-notation cutoffs), while log10/
    * floor are correctly rounded in both and the oracle mirrors the same
    * expression. Non-positive and NULL values are excluded (Benford is
    * undefined there) but tallied: `n_excluded` rides on every row so a
    * feed going half-zero can't silently shrink the audited population.
    *
    * Returns 9 rows (digit, n, p_obs, p_benford, dev) with dev =
    * p_obs − p_benford; digits absent from the data still appear with
    * n = 0 (their deficit IS the finding). Scale shape: one map-side
    * digit expression + one ≤9-key partial-aggregated groupBy; the
    * digit spine joins against the tiny aggregate. */
  def benfordAudit(df: DataFrame, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    val spark = df.sparkSession
    import spark.implicits._
    val tallied = df.select(
        when(x.isNotNull && x > 0,
          floor(x / pow(lit(10.0), floor(log10(x)))).cast("int"))
          .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val excluded = tallied.filter(col("digit").isNull)
      .select(col("n").as("__nex"))
    val digits = tallied.filter(col("digit").isNotNull)
    val spine = (1 to 9).toDF("digit")
    val all = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    spine.join(digits, Seq("digit"), "left").na.fill(0L, Seq("n"))
      // the excluded tally can be an EMPTY aggregate (all rows valid) —
      // a left join against the 1-or-0-row frame, then fill 0
      .crossJoin(broadcast(excluded.agg(
        coalesce(sum(col("__nex")), lit(0L)).as("n_excluded"))))
      .select(col("digit"), col("n"), col("n_excluded"),
        round(col("n") / sum(col("n")).over(all), 6).as("p_obs"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("p_benford"))
      .withColumn("dev", round(col("p_obs") - col("p_benford"), 6))
  }

  /** Zone map: per-zone (min, max, count) statistics over a value column —
    * the data-skipping index every 100 TB table lives or dies by. A "zone"
    * is whatever physical unit a scan can skip (a file, a row group, a
    * partition directory); on an ingest-ordered table the zone statistics
    * of an event-time column are tight, and a time predicate prunes most
    * zones without reading them. Returns (zone, n_rows, v_min, v_max).
    *
    * Scale shape: ONE partial-aggregated groupBy on the zone expression —
    * min/max/count all combine map-side; output is |zones| rows. */
  def zoneMap(df: DataFrame, zone: Column, valueCol: String): DataFrame =
    df.groupBy(zone.as("zone"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(valueCol)).as("v_min"), max(col(valueCol)).as("v_max"))

  /** [[zoneMap]] plus the skip decision for a `value >= lo` predicate:
    * `skippable = 1` iff the zone's v_max falls below `lo` — every row in
    * the zone fails the predicate, so a scan can drop the whole zone on
    * statistics alone. The audit to run BEFORE betting a query pattern on
    * clustering: `sum(skippable-zone rows) / total` is the I/O the layout
    * saves, and ~0 on a shuffled table says re-cluster first.
    *
    * A zone with NULL statistics (all-NULL values) reports skippable = 0
    * — the CONSERVATIVE choice real engines make: stats that prove
    * nothing scan the zone. (For this specific >= predicate NULL values
    * can never pass, so 1 would also be sound — but the flag must stay
    * trustworthy when callers swap in IS NULL-style predicates.) */
  def zoneSkipAudit(
      df: DataFrame, zone: Column, valueCol: String, lo: Column): DataFrame =
    zoneMap(df, zone, valueCol)
      .withColumn("skippable",
        when(col("v_max") < lo, 1).otherwise(0))

  /** 2-D equi-width histogram — the joint-density heatmap behind
    * correlation eyeballing and 2-column outlier fences. Same binning
    * contract as [[equiWidthHistogram]] per axis (bounds from the data,
    * max closes into the last bin, deliberate FP operation order, NULLs
    * in either coordinate excluded). Returns (bin_x, bin_y, n) for
    * OCCUPIED cells only — at 100 TB the empty-cell spine (nx·ny rows)
    * is the caller's join if they want it dense.
    *
    * Scale shape: one 1-row bounds aggregate broadcast back, one
    * partial-aggregated groupBy on the bin pair — two scans, no sort. */
  def hist2d(
      df: DataFrame, xCol: String, yCol: String,
      nx: Int, ny: Int): DataFrame = {
    require(nx > 0 && ny > 0, s"bin counts must be positive, got ($nx, $ny)")
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val bounds = base.agg(
      min(x).as("__xlo"), max(x).as("__xhi"),
      min(y).as("__ylo"), max(y).as("__yhi"))
    def bin(v: Column, lo: Column, hi: Column, n: Int) =
      when(hi === lo, lit(0))
        .otherwise(least(floor((v - lo) * n / (hi - lo)), lit(n - 1)))
        .cast("int")
    base.crossJoin(broadcast(bounds))
      .select(
        bin(x, col("__xlo"), col("__xhi"), nx).as("bin_x"),
        bin(y, col("__ylo"), col("__yhi"), ny).as("bin_y"))
      .groupBy("bin_x", "bin_y").agg(count(lit(1)).as("n"))
  }

  /** Mutual information between two categorical columns, reported as
    * per-cell contributions (nats): term = p(a,b) · ln(p(a,b) / (p(a)p(b)))
    * — `sum(mi_term)` is the MI. The companion to [[chiSquare]]: chi²
    * says WHETHER the columns associate, MI says how many bits/nats of
    * one the other carries (the feature-redundancy measure for "is
    * `source` just `lang` renamed?"). Same cell/marginal scale shape as
    * [[chiSquare]] — one groupBy over the pair, marginals aggregated
    * FROM the cells, N broadcast; NULL categories drop identically.
    * Terms are computed in the pinned order (obs/n) · ln((obs·n)/(rt·ct))
    * and round to 6; cells observed zero never appear (0·ln 0 = 0). */
  def mutualInfo(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col(aCol)).agg(sum(col("obs")).as("__rt"))
    val colT = cells.groupBy(col(bCol)).agg(sum(col("obs")).as("__ct"))
    val n = cells.agg(sum(col("obs")).cast("double").as("__n"))
    val o = col("obs").cast("double")
    cells.join(rowT, aCol).join(colT, bCol)
      .crossJoin(broadcast(n))
      .withColumn("mi_term", round(
        (o / col("__n")) * log((o * col("__n")) /
          (col("__rt").cast("double") * col("__ct").cast("double"))), 6))
      .select(col(aCol), col(bCol), col("obs"), col("mi_term"))
  }

  /** Join-skew audit: the `topK` join keys by estimated output
    * contribution (n_left × n_right) — the pre-flight check that names
    * the exact keys that will make a join straggle, where
    * [[joinEstimate]]'s System-R model only sizes the total. A key with
    * est_pairs ~ 10⁸ is the one to salt, broadcast around, or filter.
    *
    * Scale shape: one partial-aggregated groupBy per side (key counts),
    * an inner join OF THE TWO AGGREGATES (|distinct keys| rows, not
    * corpus rows), then TakeOrdered for the top-k — the fact tables are
    * each scanned once and never joined to each other. NULL keys are
    * excluded: they never match in the real equi-join, so they cannot
    * contribute output rows (their scan-side volume shows up in
    * [[columnProfile]] null counts instead).
    *
    * `est_pairs` is a DOUBLE: the pathological hot key this audit exists
    * to surface (> ~3·10⁹ rows per side at 100 TB) overflows a LONG
    * product silently, corrupting the top-K ordering so the worst key is
    * the one that goes missing. The double product of two exact longs is
    * a single correctly-rounded IEEE op (counts < 2⁵³), so small values
    * stay exact and cross-engine comparable; huge ones lose ULPs, not
    * ordering. */
  def joinSkewAudit(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val l = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val r = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    l.join(r, "key")
      .withColumn("est_pairs", col("n_left").cast("double") * col("n_right"))
      .orderBy(col("est_pairs").desc, col("key"))
      .limit(topK)
  }

  /** 2-D Pareto frontier (skyline): the (x, y) trade-off curve where x is
    * MAXIMIZED and y is MINIMIZED — e.g. "largest part size at each price
    * point no other size beats". A point is on the frontier iff no other
    * point has strictly larger x with a y that is not larger.
    *
    * Scale shape — the naive skyline is an O(n²) dominance self-join;
    * this one is one partial-aggregated groupBy (per distinct x: best y
    * + supporting row count) followed by a cumulative-min window over the
    * |distinct x| aggregate rows ordered by x descending: a point's best
    * y survives iff it undercuts every y seen at larger x. The corpus is
    * scanned once and never self-joined; the window touches only the
    * aggregate. (|distinct x| itself large is fine — the window is a
    * linear scan — but callers should know the output is one row per
    * distinct x before filtering.)
    *
    * Returns (x, best_y, n_at_x, on_frontier 0/1) for every distinct x —
    * keeping dominated x values visible (on_frontier = 0) turns the
    * result into the full trade-off staircase, not just the winners.
    * NULL x or y rows are excluded (dominance is undefined on NULL). */
  def paretoFrontier(
      df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val perX = df
      .filter(col(maxCol).isNotNull && col(minCol).isNotNull)
      .groupBy(col(maxCol).as("x"))
      .agg(min(col(minCol)).as("best_y"), count(lit(1)).as("n_at_x"))
    val prevBest = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").desc).rowsBetween(Long.MinValue, -1)
    perX.withColumn("__prev", min(col("best_y")).over(prevBest))
      .withColumn("on_frontier",
        when(col("__prev").isNull || col("best_y") < col("__prev"), 1)
          .otherwise(0))
      .drop("__prev")
  }

  /** RFM scoring (recency / frequency / monetary) — the classic entity
    * segmentation over a transaction table: per entity, days since last
    * transaction (relative to the corpus max date), transaction count, and
    * fixed-point monetary mass, each bucketed 1–5 by the corpus-wide
    * quintile cuts. `r_score` is INVERTED (most recent = 5) so that 5/5/5
    * is always the best segment. Returns
    * (key, r_days, f, m_cents, r_score, f_score, m_score).
    *
    * Scale shape: one groupBy to the per-entity table, one 1-row
    * aggregate for the max date and the nine quintile cuts (broadcast
    * back), scores as map-side cut comparisons — no window, no sort, no
    * per-entity second pass.
    *
    * Numeric contract: r_days/f are integer-grid; money goes fixed-point
    * BEFORE summing (`round(x·100)` → BIGINT cents — per-entity double
    * sums would accumulate order-dependent error, the house rule), so
    * every quintile interpolates an integer grid (K = 1, output grid
    * 0.05·grid — the audited-safe tie class) and is rounded to 4 on both
    * engines before the `>` bucket comparisons. */
  def rfmScores(
      df: DataFrame, keyCol: String, dateCol: String,
      amountCol: String): DataFrame = {
    // last-transaction date as integer DAYS since epoch, so every quantile
    // below interpolates an integer grid and the recency cuts fall out of
    // the SAME one-row aggregate: linear interpolation is
    // affine-equivariant, so q_p(maxd − dd) = maxd − q_{1−p}(dd) EXACTLY —
    // no second scan for recency statistics
    val per = df.filter(col(keyCol).isNotNull && col(dateCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(datediff(col(dateCol).cast("date"), lit("1970-01-01")))
          .cast("long").as("__dd"),
        count(lit(1)).as("f"),
        sum(round(col(amountCol).cast("double") * 100, 0).cast("long"))
          .as("m_cents"))
    val ps = Seq(0.2, 0.4, 0.6, 0.8)
    def cuts(c: Column, name: String, qs: Seq[Double]) =
      qs.zipWithIndex.map { case (p, i) =>
        round(percentile(c, lit(p)), 4).as(s"__${name}$i") }
    val statCols =
      max(col("__dd")).as("__maxdd") +:
        (cuts(col("f").cast("double"), "f", ps) ++
          cuts(col("m_cents").cast("double"), "m", ps) ++
          // reversed order: __r{i} holds q_{1-p_i}(dd), subtracted below
          cuts(col("__dd").cast("double"), "r", ps.reverse))
    val stats = per.agg(statCols.head, statCols.tail: _*)
    def score(v: Column, cut: Int => Column) =
      ps.indices.map(i => when(v > cut(i), 1).otherwise(0)).reduce(_ + _) + 1
    per.crossJoin(broadcast(stats))
      .withColumn("r_days", col("__maxdd") - col("__dd"))
      .select(col(keyCol), col("r_days"), col("f"), col("m_cents"),
        (lit(6) - score(col("r_days").cast("double"),
          i => col("__maxdd") - col(s"__r$i"))).as("r_score"),
        score(col("f").cast("double"), i => col(s"__f$i")).as("f_score"),
        score(col("m_cents").cast("double"), i => col(s"__m$i")).as("m_score"))
  }

  /** Welch's two-sample t statistic — the unequal-variance A/B comparison
    * (the default experiment read: never assume the variant didn't change
    * the variance too). Requires EXACTLY two groups (raise_error
    * otherwise — a silently dropped third variant is a wrong experiment,
    * not a convenience) and ≥2 rows per group. Returns one row:
    * (group_a, group_b, n_a, n_b, mean_a, mean_b, t) with groups in
    * ascending name order so the sign of t is reproducible.
    *
    * Numeric contract: values go fixed-point (`round(x·100)` → BIGINT
    * cents) BEFORE summing — per-group double sums accumulate
    * order-dependent error (house rule) — so n/Σx/Σx² are exact BIGINTs;
    * then means, the two variances (n·Σx² − (Σx)² over n·(n−1)), the
    * pooled standard error, and t are a FIXED chain of IEEE ops evaluated
    * in the same order on both engines: deterministic without any
    * rounding gate. Statistics are in CENTS (scale-invariant for t).
    *
    * Scale shape: one partial-aggregated groupBy to two rows, reshaped
    * against a broadcast 1-row name pair — the corpus is scanned once. */
  def welchTTest(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = round(col(valueCol).cast("double") * 100, 0).cast("long")
    val stats = df.filter(col(valueCol).isNotNull && col(groupCol).isNotNull)
      .groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"), sum(cents).as("__s"),
        sum(cents * cents).as("__ss"))
    val names = stats.agg(
      count(lit(1)).as("__k"),
      min(col("__g")).as("group_a"), max(col("__g")).as("group_b"))
    def side(tag: String) = Seq(
      sum(when(col("__g") === col(s"group_$tag"), col("__n"))).as(s"n_$tag"),
      sum(when(col("__g") === col(s"group_$tag"), col("__s"))).as(s"__s$tag"),
      sum(when(col("__g") === col(s"group_$tag"), col("__ss"))).as(s"__ss$tag"))
    val aggs = side("a") ++ side("b")
    val wide = stats.crossJoin(broadcast(names))
      .groupBy("__k", "group_a", "group_b")
      .agg(aggs.head, aggs.tail: _*)
    def mean(tag: String) =
      col(s"__s$tag").cast("double") / col(s"n_$tag").cast("double")
    def variance(tag: String) =
      (col(s"n_$tag") * col(s"__ss$tag") - col(s"__s$tag") * col(s"__s$tag"))
        .cast("double") /
        (col(s"n_$tag") * (col(s"n_$tag") - 1)).cast("double")
    // guards ride INSIDE output columns (the psiDrift pattern) — a
    // projected-then-dropped guard column would be pruned unevaluated
    wide.select(col("group_a"), col("group_b"),
      when(col("__k") =!= 2, raise_error(concat(
          lit("welchTTest requires exactly two groups, got "),
          col("__k").cast("string"))).cast("long"))
        .otherwise(col("n_a")).as("n_a"),
      when(col("n_a") < 2 || col("n_b") < 2, raise_error(
          lit("welchTTest requires >= 2 rows per group")).cast("long"))
        .otherwise(col("n_b")).as("n_b"),
      mean("a").as("mean_a"), mean("b").as("mean_b"),
      ((mean("a") - mean("b")) /
        sqrt(variance("a") / col("n_a").cast("double") +
          variance("b") / col("n_b").cast("double"))).as("t"))
  }

  /** Item co-occurrence with lift — association mining over baskets
    * (orders, sessions, documents-as-bags): for every unordered item pair
    * seen in at least `minPairCount` baskets, the observed co-basket
    * count and lift = P(a,b) / (P(a)·P(b)) — lift > 1 means the items
    * travel together beyond chance ([[graft.operators.TextAnalysis]]'s
    * pmi_collocations is the text twin; this is the relational one).
    * Returns (item_a, item_b, n_ab, lift) with item_a < item_b.
    *
    * Scale shape: baskets collapse to DISTINCT (basket, item) first, so
    * the self-join is keyed on the BASKET and its fan-out per basket is
    * |items-in-basket|² — bounded by basket size, never corpus size (the
    * sourceOverlap argument). Item counts and the basket total join back
    * on the item key / as a 1-row broadcast. `minPairCount` prunes the
    * long singleton tail BEFORE the count joins.
    *
    * Numeric contract: lift = (n_baskets·n_ab) / (n_a·n_b) — one IEEE
    * division of exact BIGINT products, bit-identical cross-engine, no
    * gate (products stay under 2^53 for any n_baskets·n_ab the join
    * could emit at catalog scales; both factors are ≤ n_baskets²). */
  def cooccurrenceLift(
      df: DataFrame, basketCol: String, itemCol: String,
      minPairCount: Int = 2): DataFrame = {
    require(minPairCount >= 1, s"minPairCount must be >= 1, got $minPairCount")
    val bi = df.filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("b"), col(itemCol).as("it")).distinct()
    val itemN = bi.groupBy("it").agg(count(lit(1)).as("__c"))
    val total = bi.agg(countDistinct(col("b")).as("__nb"))
    bi.select(col("b"), col("it").as("item_a"))
      .join(bi.select(col("b"), col("it").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
      .join(itemN.select(col("it").as("item_a"), col("__c").as("__ca")), Seq("item_a"))
      .join(itemN.select(col("it").as("item_b"), col("__c").as("__cb")), Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        ((col("__nb") * col("n_ab")).cast("double") /
          (col("__ca") * col("__cb")).cast("double")).as("lift"))
  }
}
