package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Ops, Tables}
import graft.operators.{Curation, Events, Privacy, Profile, Similarity, TextAnalysis}

/** Round-7 scale-operator queries: profiling (histogram, heavy hitters with
  * CMS validation), Bloom-prefiltered semi-join, windowed funnel analysis,
  * and native-expression text normalization. Same conventions as
  * [[Queries]]/[[ExtQueries]]: every key has a DuckDB oracle; sketch checks
  * follow the flag-differential pattern (exact values oracle-recomputed,
  * within-tolerance flags pinned to 1).
  */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** 20-bin equi-width histogram of lineitem prices. The oracle mirrors
    * the bin arithmetic token-for-token (see
    * [[Profile.equiWidthHistogram]] on FP operation order). */
  val histBins: Q = (s, d) =>
    Profile.equiWidthHistogram(t(s, d, "lineitem"), "l_extendedprice", nBins = 20)
      .orderBy("bin")

  /** Exact heavy hitters (users with ≥ 75 events) cross-checked against a
    * Count-Min Sketch: exact counts oracle-recomputed, `cms_ok` pins the
    * sketch contract (cnt ≤ est ≤ cnt + ⌈eps·N⌉) — deterministic for the
    * fixed seed; verified 1 across sf0.001/0.01/0.1. */
  val heavyHitters: Q = (s, d) =>
    Profile.heavyHittersChecked(Tables.loadEvents(s, d), "user_id", minCount = 75)
      .orderBy("user_id")

  /** Bloom-prefiltered semi-join: orders of BUILDING-segment customers.
    * Result must equal the plain semi-join (the oracle IS the plain
    * semi-join); the Bloom prefilter only changes the physical shape.
    * expectedItems sized for the sf0.1 fixture x10 headroom. */
  val bloomSemi: Q = (s, d) => {
    val dim = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
    Ops.bloomSemiJoin(t(s, d, "orders"), dim, "o_custkey", "c_custkey",
      expectedItems = 200000L, fpp = 0.01)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** view → click → purchase funnel with a 24h conversion window —
    * differentiating on the fixture (reach 1500/536/217 at sf0.1), unlike
    * the unwindowed funnel where every user converts. */
  val funnelSteps: Q = (s, d) =>
    Events.funnelReach(Tables.loadEvents(s, d), "user_id", "ts", "event_type",
      steps = Seq("view", "click", "purchase"), windowMinutes = 24 * 60)
      .orderBy("step")

  /** The same funnel with per-step conversion rates (step 1 NULL). */
  val funnelConversionQ: Q = (s, d) =>
    Events.funnelConversion(Tables.loadEvents(s, d), "user_id", "ts", "event_type",
      steps = Seq("view", "click", "purchase"), windowMinutes = 24 * 60)
      .orderBy("step")

  /** Language-ID confusion matrix vs the declared lang column. */
  val langConfusionQ: Q = (s, d) =>
    TextAnalysis.langConfusion(t(s, d, "documents"), "lang", "text")
      .orderBy("lang", "lang_pred")

  /** NFC + lowercase + whitespace-collapse normalization over documents,
    * through the native [[graft.plans.NfcNormalize]] expression. The
    * fixture is pure ASCII (NFC is identity there — the lower/collapse
    * steps carry the oracle signal); non-ASCII NFC semantics are pinned in
    * PlanSpec against crafted composed/decomposed strings. */
  val textNormalize: Q = (s, d) =>
    TextAnalysis.withNormalizedText(t(s, d, "documents"), "text")
      .select("doc_id", "text_norm").orderBy("doc_id")

  /** Equi-depth (quartile) histogram of order totals — percentile-cut
    * binning, never a global-sort ntile (see
    * [[Profile.equiDepthHistogram]]).
    *
    * REGISTERED with the approx-sketch cut path — the 100 TB configuration
    * (exact single-group `percentile` buffers every distinct value in one
    * aggregator; 1.6–2.0 s at sf0.1 and a memory hazard beyond it). Approx
    * cuts are sketch-dependent, so like agg_sketch/heavy_hitters this is a
    * tolerance differential rather than a row-identical dump:
    *   - n_total — exact non-null row count summed over bins; DuckDB
    *     recomputes it (row conservation is cut-independent, so this stays
    *     an EXACT pin: no row lost or duplicated by binning);
    *   - depth_ok — each quartile bin holds N/4 ± (4·N/accuracy + 4) rows,
    *     the GK-sketch rank-error bound (ε = 1/accuracy per cut, two cuts
    *     bound a bin) with a small integer slack;
    *   - span_ok — lo ≤ hi within the bin.
    * Exact ≡ approx cut equivalence at the fixture stays pinned in
    * ProfileSpec; the exact path remains the library default
    * (`approxAccuracy = None`). */
  val histQuantile: Q = (s, d) => {
    val acc = 10000
    val binned = Profile.equiDepthHistogram(
      t(s, d, "orders"), "o_totalprice", nBins = 4, approxAccuracy = Some(acc))
    // window-sum over the 4-row aggregate, NOT a count-agg + crossJoin: a
    // second aggregate branch would re-execute the whole histogram; this
    // "global" window sees exactly nBins rows, so the single-task stage the
    // operator itself avoids is harmless here
    binned.withColumn("n_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window
          .rowsBetween(Long.MinValue, Long.MaxValue)))
      .select(col("bin"), col("n_total"),
        when(abs(col("n") - col("n_total") / 4)
          <= col("n_total") * 4 / acc + 4, 1).otherwise(0).as("depth_ok"),
        when(col("lo") <= col("hi"), 1).otherwise(0).as("span_ok"))
      .orderBy("bin")
  }

  /** Distribution drift (PSI) between two deterministic halves of the
    * orders table — the corpus-version drift check (see
    * [[Profile.psiDrift]]); the even/odd orderkey split gives two
    * same-distribution samples, so the interesting pin is the arithmetic,
    * not a large PSI. */
  val driftPsi: Q = (s, d) => {
    val orders = t(s, d, "orders")
    Profile.psiDrift(
      orders.filter(col("o_orderkey") % 2 === 0),
      orders.filter(col("o_orderkey") % 2 === 1),
      "o_totalprice", nBins = 10)
      .orderBy("bin")
  }

  /** Categorical drift: language-mix PSI between the even/odd doc_id
    * halves of the documents table (see [[Profile.psiDriftCategorical]]). */
  val driftLang: Q = (s, d) => {
    val docs = t(s, d, "documents")
    Profile.psiDriftCategorical(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      "lang")
      .orderBy("lang")
  }

  /** One-pass ANALYZE-style column profile of the orders table. */
  val profileCols: Q = (s, d) =>
    Profile.columnProfile(t(s, d, "orders"),
      Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"))
      .orderBy("col_name")

  /** Hash-stable 20-per-source document sample (balanced subset). */
  val sampleGroup: Q = (s, d) =>
    Profile.sampleKPerGroup(t(s, d, "documents"), "doc_id", "source", k = 20)
      .select("doc_id", "source").orderBy("source", "doc_id")

  /** Hourly event-rate anomalies per type at |z| ≥ 2, gap hours
    * zero-filled (so a silent source is flaggable, not invisible). */
  val rateAnomaly: Q = (s, d) =>
    Events.rateAnomalies(Tables.loadEvents(s, d), "ts", "event_type")
      .orderBy("event_type", "hour")

  /** Day-cohort retention matrix over the events fixture (who is still
    * active N days after their first-seen day). */
  val cohortRetention: Q = (s, d) =>
    Events.cohortRetention(Tables.loadEvents(s, d), "user_id", "ts", period = "day")
      .orderBy("cohort", "period_offset")

  /** Per-source document-length quartiles + p95 — the distribution check
    * behind any length-based curation threshold. */
  val groupQuantiles: Q = (s, d) =>
    Profile.groupQuantiles(t(s, d, "documents"), "source", "n_chars",
      ps = Seq(0.25, 0.5, 0.75, 0.95))
      .orderBy("source")

  /** 2-hour windows sliding every 30 minutes per event type — each event
    * in 4 overlapping windows (the bounded Expand fan-out, no self-join). */
  val slidingCounts: Q = (s, d) =>
    Events.slidingCounts(Tables.loadEvents(s, d), "ts", "event_type",
      widthMinutes = 120, slideMinutes = 30)
      .orderBy("win_start", "event_type")

  /** Top-50 adjacent-token collocations by PMI (pair count ≥ 25). */
  val pmiCollocations: Q = (s, d) =>
    TextAnalysis.pmiCollocations(t(s, d, "documents"), "text",
      minPairCount = 25, k = 50)

  /** Per-source winsorization of document lengths to [p5, p95]. */
  val winsorizeLen: Q = (s, d) =>
    Profile.winsorize(t(s, d, "documents"), "source", "n_chars",
      pLo = 0.05, pHi = 0.95)
      .select("doc_id", "source", "n_chars", "n_chars_clipped")
      .orderBy("doc_id")

  /** Per-document OOV rate against the corpus's own top-500 token vocab
    * (deterministic: count desc, token asc). Self-referential on purpose —
    * no external vocab table needed, and the oracle derives the identical
    * vocab from the identical total order. */
  val vocabCoverage: Q = (s, d) => {
    val docs = t(s, d, "documents")
    val vocab = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(500)
    TextAnalysis.vocabCoverage(docs, "doc_id", "text", vocab, "w")
      .orderBy("doc_id")
  }

  /** Language × source contingency with per-cell chi-square contributions
    * — the corpus-composition independence check. */
  val chiSquareLs: Q = (s, d) =>
    Profile.chiSquare(t(s, d, "documents"), "lang", "source")
      .orderBy("lang", "source")

  /** k-anonymity audit of documents on (lang, source, length-bucket) quasi
    * identifiers at k=5 — the privacy gate before releasing a tabular
    * slice (see [[Privacy.kAnonymity]]). */
  val kAnonymityDocs: Q = (s, d) =>
    Privacy.kAnonymity(
      t(s, d, "documents").withColumn("len_bucket", floor(col("n_chars") / 200)),
      Seq("lang", "source", "len_bucket"), k = 5)
      .orderBy("lang", "source", "len_bucket")

  /** t-closeness audit of documents on (lang, length-bucket) equivalence
    * classes with `source` as the sensitive attribute at t = 0.2 —
    * completes the k-anonymity / l-diversity / t-closeness release triad
    * (see [[Privacy.tCloseness]]); the oracle mirrors the cell/global
    * distribution arithmetic and the absent-category folding identity
    * term for term. */
  val tClosenessDocs: Q = (s, d) =>
    Privacy.tCloseness(
      t(s, d, "documents").withColumn("len_bucket", floor(col("n_chars") / 200)),
      Seq("lang", "len_bucket"), "source", t = 0.2)
      .orderBy("lang", "len_bucket")

  /** Ordered t-closeness of customers per market segment with the numeric
    * nation key as the sensitive attribute at t = 0.05 — the paper's
    * ordered-distance EMD for salary-style columns (see
    * [[Privacy.tClosenessOrdered]]); the oracle mirrors the spine /
    * class-expansion / cumulative-difference arithmetic window for
    * window. */
  val tClosenessOrd: Q = (s, d) =>
    Privacy.tClosenessOrdered(
      t(s, d, "customer"), Seq("c_mktsegment"), "c_nationkey", t = 0.05)
      .orderBy("c_mktsegment")

  /** 32-way hash-shard write manifest over documents (see
    * [[Curation.shardManifest]]); load_ratio pins the uniformity of the
    * md5-derived shard assignment. */
  val shardManifestDocs: Q = (s, d) =>
    Curation.shardManifest(t(s, d, "documents"), "doc_id", "n_chars", nShards = 32)
      .orderBy("shard_id")

  /** Deterministic 16-shard interleaved training order over documents —
    * the global-sort-free corpus shuffle (see [[Curation.interleaveOrder]]). */
  val interleaveOrderDocs: Q = (s, d) =>
    Curation.interleaveOrder(t(s, d, "documents"), "doc_id", nShards = 16)
      .orderBy("global_ord")

  /** Int8 quantization audit of the embeddings table (see
    * [[Similarity.quantizeInt8]]); scale/mse/max_err mirrored in DuckDB
    * list lambdas with the shared rounding gates. */
  val quantizeEmbed: Q = (s, d) =>
    Similarity.quantizeInt8(t(s, d, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  val all: Map[String, Q] = Map(
    "k_anonymity" -> kAnonymityDocs,
    "t_closeness" -> tClosenessDocs,
    "t_closeness_ord" -> tClosenessOrd,
    "shard_manifest" -> shardManifestDocs,
    "interleave_order" -> interleaveOrderDocs,
    "quantize_embed" -> quantizeEmbed,
    "chi_square" -> chiSquareLs,
    "cohort_retention" -> cohortRetention,
    "sliding_counts" -> slidingCounts,
    "pmi_collocations" -> pmiCollocations,
    "winsorize_len" -> winsorizeLen,
    "vocab_coverage" -> vocabCoverage,
    "group_quantiles" -> groupQuantiles,
    "rate_anomaly" -> rateAnomaly,
    "hist_bins" -> histBins,
    "hist_quantile" -> histQuantile,
    "profile_cols" -> profileCols,
    "drift_psi" -> driftPsi,
    "drift_lang" -> driftLang,
    "sample_group" -> sampleGroup,
    "heavy_hitters" -> heavyHitters,
    "bloom_semi" -> bloomSemi,
    "funnel_steps" -> funnelSteps,
    "funnel_conversion" -> funnelConversionQ,
    "lang_confusion" -> langConfusionQ,
    "text_normalize" -> textNormalize,
  )

  val oracles: Map[String, String] = Map(
    // len_bucket: duckdb floor yields DOUBLE (spark's yields BIGINT);
    // at_risk CASE cast to INTEGER to match spark's when/otherwise INT
    "k_anonymity" ->
      """SELECT lang, source, CAST(floor(n_chars / 200) AS BIGINT) AS len_bucket,
        |  count(*) AS n,
        |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
        |FROM documents GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // t_closeness: cells / window class totals / broadcast global dist,
    // then the absent-category folding identity ((sd + (1 - sp)) / 2) in
    // the exact Spark parenthesization; probs are BIGINT/BIGINT true
    // divisions on both engines; the at_risk gate compares the ROUNDED tvd
    "t_closeness" ->
      """WITH d AS (
        |  SELECT lang, CAST(floor(n_chars / 200) AS BIGINT) AS len_bucket,
        |    source
        |  FROM documents),
        |cells AS (
        |  SELECT lang, len_bucket, source, CAST(count(*) AS BIGINT) AS c
        |  FROM d GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) /
        |      CAST(sum(count(*)) OVER () AS BIGINT) AS pg
        |  FROM d GROUP BY 1),
        |j AS (
        |  SELECT cells.lang, cells.len_bucket,
        |    CAST(sum(cells.c) OVER (PARTITION BY cells.lang, cells.len_bucket)
        |      AS BIGINT) AS n,
        |    cells.c, g.pg
        |  FROM cells JOIN g ON cells.source IS NOT DISTINCT FROM g.source),
        |agg AS (
        |  SELECT lang, len_bucket, max(n) AS n,
        |    round((sum(abs(c / CAST(n AS DOUBLE) - pg)) + (1.0 - sum(pg))) / 2,
        |      6) AS tvd
        |  FROM j GROUP BY 1, 2)
        |SELECT lang, len_bucket, n, tvd,
        |  CAST(CASE WHEN tvd > 0.2e0 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
        |FROM agg ORDER BY lang, len_bucket""".stripMargin,
    // t_closeness_ord: the ordered-distance EMD — global value spine with
    // cumulative-mass windows, class × spine expansion (absent cells
    // contribute p_c = 0 but the global mass still moves), per-class
    // cumsum in spine order, normalized by (m − 1); probs are
    // BIGINT/BIGINT true divisions and the cumsum accumulates in the same
    // spine order on both engines, so only the final sum-of-|cum| crosses
    // the round-6 gate
    "t_closeness_ord" ->
      """WITH v AS (
        |  SELECT c_mktsegment AS q, CAST(c_nationkey AS DOUBLE) AS v
        |  FROM customer WHERE c_nationkey IS NOT NULL),
        |spine AS (
        |  SELECT v,
        |    CAST(count(*) AS BIGINT) /
        |      CAST(sum(count(*)) OVER () AS BIGINT) AS pg,
        |    row_number() OVER (ORDER BY v) AS pos,
        |    count(*) OVER () AS m
        |  FROM v GROUP BY v),
        |cells AS (
        |  SELECT q, v, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1, 2),
        |classes AS (
        |  SELECT q, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
        |j AS (
        |  SELECT classes.q, classes.n, spine.pg, spine.pos, spine.m, cells.c
        |  FROM classes CROSS JOIN spine
        |  LEFT JOIN cells ON cells.q IS NOT DISTINCT FROM classes.q
        |    AND cells.v = spine.v),
        |cum AS (
        |  SELECT q, n, pos, m,
        |    sum(coalesce(c, 0) / CAST(n AS DOUBLE) - pg) OVER (
        |      PARTITION BY q ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
        |  FROM j),
        |agg AS (
        |  SELECT q AS c_mktsegment, max(n) AS n,
        |    round(coalesce(
        |      sum(CASE WHEN pos < m THEN abs(cumv) END) / (max(m) - 1),
        |      0.0), 6) AS emd
        |  FROM cum GROUP BY q)
        |SELECT c_mktsegment, n, emd,
        |  CAST(CASE WHEN emd > 0.05e0 THEN 1 ELSE 0 END AS INTEGER) AS at_risk
        |FROM agg ORDER BY c_mktsegment""".stripMargin,
    // the shard draw mirrors Curation.shardId: first 4 md5 hex chars as an
    // integer mod nShards ('0x' string cast = spark's conv(..,16,10));
    // sum(BIGINT) cast back from duckdb's HUGEINT
    "shard_manifest" ->
      """WITH a AS (
        |  SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 32
        |      AS shard_id,
        |    n_chars
        |  FROM documents)
        |SELECT shard_id, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_size,
        |  round(CAST(count(*) * 32 AS DOUBLE) / sum(count(*)) OVER (), 4) AS load_ratio
        |FROM a GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    "interleave_order" ->
      """WITH a AS (
        |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER % 16
        |      AS shard_id
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT doc_id, shard_id,
        |  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY h, doc_id) - 1
        |    AS BIGINT) * 16 + shard_id AS global_ord
        |FROM a ORDER BY global_ord""".stripMargin,
    // quantization arithmetic mirrored with the shared rounding gates:
    // scale rounds to 6 BEFORE quantizing, codes clamp at +/-127, error
    // sums run over the list in order; dim cast (duckdb len -> BIGINT,
    // spark size -> INT); the scale=0 zero-vector case never divides
    "quantize_embed" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, e,
        |    round(list_max(list_transform(e, x -> abs(x))) / 127, 6) AS scale
        |  FROM v),
        |q AS (
        |  SELECT vec_id, e, scale,
        |    list_transform(e, x -> x -
        |      greatest(least(round(x / scale, 0), CAST(127 AS DOUBLE)),
        |               CAST(-127 AS DOUBLE)) * scale) AS err
        |  FROM s)
        |SELECT vec_id, CAST(len(e) AS INTEGER) AS dim, scale,
        |  CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(list_sum(list_transform(err, x -> x * x)) / len(e), 8)
        |  END AS mse,
        |  CASE WHEN scale = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(list_max(list_transform(err, x -> abs(x))), 6)
        |  END AS max_err
        |FROM q ORDER BY vec_id""".stripMargin,
    // expected/chi2 doubles mirror the Spark operation order exactly:
    // rt*ct/n first, then (obs-e)^2/e, then round 4. sums cast to BIGINT
    // inside the CTEs (duckdb sums integers into HUGEINT, spark into LONG)
    "chi_square" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM cells)
        |SELECT c.lang, c.source, c.obs,
        |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n, 4) AS expected,
        |  round((CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
        |        * (CAST(obs AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n)
        |        / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / n), 4) AS chi2
        |FROM cells c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
        |ORDER BY lang, source""".stripMargin,
    "cohort_retention" ->
      """WITH first AS (
        |  -- CAST: duckdb's date_trunc('day') yields DATE, spark's TIMESTAMP
        |  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS p
        |  FROM events)
        |SELECT cohort, CAST(date_diff('day', cohort, p) AS INTEGER) AS period_offset,
        |  count(*) AS n_users
        |FROM active JOIN first USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "group_quantiles" ->
      """SELECT source,
        |  round(quantile_cont(n_chars, 0.25), 4) AS p25,
        |  round(quantile_cont(n_chars, 0.50), 4) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 4) AS p75,
        |  round(quantile_cont(n_chars, 0.95), 4) AS p95
        |FROM documents WHERE n_chars IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,
    // CAST(sum AS BIGINT): duckdb sums integers into HUGEINT; spark into LONG
    "vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, count(*) AS c FROM toks GROUP BY 1
        |    ORDER BY c DESC, w LIMIT 500))
        |SELECT t.doc_id, count(*) AS n_tok,
        |  CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / count(*), 4) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.w = v.w
        |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // PMI mirrored with the same double operation order as the Spark side
    // (divide by totals first, then the ratio, then ln, then round 4);
    // bigrams via list_zip of the token list against its own tail
    "pmi_collocations" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS ts FROM documents),
        |words AS (SELECT unnest(ts) AS w FROM toks),
        |uni AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
        |pairs AS (
        |  SELECT p[1] AS w1, p[2] AS w2
        |  FROM (SELECT unnest(list_zip(ts[1:-2], ts[2:])) AS p
        |        FROM toks WHERE len(ts) > 1)),
        |bigall AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        |n1 AS (SELECT CAST(sum(c) AS DOUBLE) AS n1 FROM uni),
        |n2 AS (SELECT CAST(sum(c12) AS DOUBLE) AS n2 FROM bigall)
        |SELECT b.w1, b.w2, b.c12,
        |  round(ln((CAST(b.c12 AS DOUBLE) / n2) /
        |    ((CAST(u1.c AS DOUBLE) / n1) * (CAST(u2.c AS DOUBLE) / n1))), 4) AS pmi
        |FROM bigall b
        |JOIN uni u1 ON u1.w = b.w1
        |JOIN uni u2 ON u2.w = b.w2
        |CROSS JOIN n1 CROSS JOIN n2
        |WHERE b.c12 >= 25
        |ORDER BY pmi DESC, w1, w2 LIMIT 50""".stripMargin,
    "winsorize_len" ->
      """WITH q AS (
        |  SELECT source,
        |    round(quantile_cont(n_chars, 0.05), 4) AS lo,
        |    round(quantile_cont(n_chars, 0.95), 4) AS hi
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY source)
        |SELECT doc_id, source, n_chars,
        |  CASE WHEN n_chars IS NULL THEN NULL
        |    ELSE round(least(greatest(CAST(n_chars AS DOUBLE), lo), hi), 4)
        |  END AS n_chars_clipped
        |FROM documents d JOIN q USING (source)
        |ORDER BY doc_id""".stripMargin,
    // sliding windows mirrored in integer microsecond arithmetic: window
    // starts are the k*slide with start ∈ (t-width, t], i.e. k from
    // (t-width)//slide + 1 (written (t-width+slide)//slide, exact for the
    // divisible boundary too) through t//slide — integer `//`, no FP ceil
    "sliding_counts" ->
      """WITH starts AS (
        |  SELECT event_type,
        |    unnest(generate_series(
        |      (epoch_us(ts) - 7200000000 + 1800000000) // 1800000000,
        |      epoch_us(ts) // 1800000000)) AS k
        |  FROM events)
        |SELECT make_timestamp(k * 1800000000) AS win_start,
        |  make_timestamp(k * 1800000000 + 7200000000) AS win_end,
        |  event_type, count(*) AS n
        |FROM starts GROUP BY 1, 2, 3 ORDER BY 1, 3""".stripMargin,
    "rate_anomaly" ->
      """WITH b AS (
        |  SELECT event_type, date_trunc('hour', min(ts)) AS h0
        |  FROM events GROUP BY 1),
        |g AS (SELECT date_trunc('hour', max(ts)) AS h1 FROM events),
        |spine AS (
        |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |  FROM b, g),
        |c AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |f AS (
        |  SELECT spine.event_type, spine.hour, coalesce(c.n, 0) AS n
        |  FROM spine LEFT JOIN c
        |    ON spine.event_type = c.event_type AND spine.hour = c.hour),
        |s AS (
        |  SELECT event_type, hour, n,
        |    round((n - avg(n) OVER (PARTITION BY event_type))
        |          / NULLIF(stddev_samp(n) OVER (PARTITION BY event_type), 0), 4) AS z
        |  FROM f)
        |SELECT event_type, hour, n, z FROM s WHERE abs(z) >= 2.0
        |ORDER BY event_type, hour""".stripMargin,
    "hist_bins" ->
      """WITH b AS (
        |  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL)
        |SELECT CAST(CASE WHEN hi = lo THEN 0
        |  ELSE least(floor((l_extendedprice - lo) * 20 / (hi - lo)), 19)
        |  END AS INTEGER) AS bin, count(*) AS n
        |FROM lineitem, b WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // drift_psi: bins over the REFERENCE (even-key) side's range, B-side
    // values clamped into edge bins; shares floored at 1e-6 and rounded 6
    // BEFORE the log term so both engines compute the identical ratio
    "drift_psi" ->
      """WITH b AS (
        |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
        |ra AS (
        |  SELECT CAST(CASE WHEN hi = lo THEN 0
        |    ELSE greatest(least(floor((o_totalprice - lo) * 10 / (hi - lo)), 9), 0)
        |    END AS INTEGER) AS bin, count(*) AS n_ref
        |  FROM orders, b WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |rb AS (
        |  SELECT CAST(CASE WHEN hi = lo THEN 0
        |    ELSE greatest(least(floor((o_totalprice - lo) * 10 / (hi - lo)), 9), 0)
        |    END AS INTEGER) AS bin, count(*) AS n_cmp
        |  FROM orders, b WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ra.bin, rb.bin) AS bin,
        |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cmp, 0) AS n_cmp
        |  FROM ra FULL JOIN rb ON ra.bin = rb.bin),
        |p AS (
        |  SELECT bin,
        |    round(greatest(CAST(n_ref AS DOUBLE) / sum(n_ref) OVER (), 1e-6), 6) AS p_ref,
        |    round(greatest(CAST(n_cmp AS DOUBLE) / sum(n_cmp) OVER (), 1e-6), 6) AS p_cmp
        |  FROM j)
        |SELECT bin, p_ref, p_cmp,
        |  round((p_ref - p_cmp) * ln(p_ref / p_cmp), 4) AS psi_term
        |FROM p ORDER BY bin""".stripMargin,
    "drift_lang" ->
      """WITH ra AS (
        |  SELECT lang, count(*) AS n_ref FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |rb AS (
        |  SELECT lang, count(*) AS n_cmp FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ra.lang, rb.lang) AS lang,
        |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cmp, 0) AS n_cmp
        |  FROM ra FULL JOIN rb ON ra.lang IS NOT DISTINCT FROM rb.lang),
        |p AS (
        |  SELECT lang,
        |    round(greatest(CAST(n_ref AS DOUBLE) / sum(n_ref) OVER (), 1e-6), 6) AS p_ref,
        |    round(greatest(CAST(n_cmp AS DOUBLE) / sum(n_cmp) OVER (), 1e-6), 6) AS p_cmp
        |  FROM j)
        |SELECT lang, p_ref, p_cmp,
        |  round((p_ref - p_cmp) * ln(p_ref / p_cmp), 4) AS psi_term
        |FROM p ORDER BY lang""".stripMargin,
    "heavy_hitters" ->
      """SELECT user_id, count(*) AS cnt, CAST(1 AS INTEGER) AS cms_ok
        |FROM events GROUP BY user_id HAVING count(*) >= 75
        |ORDER BY user_id""".stripMargin,
    "bloom_semi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    // the funnel_steps CTEs with a lag-derived rate over the k-row summary
    "funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(s1.t)
        |    AND epoch_us(e.ts) - epoch_us(s1.t) <= 86400000000 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(s2.t)
        |    AND epoch_us(e.ts) - epoch_us(s2.t) <= 86400000000 GROUP BY e.user_id),
        |f AS (
        |  SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM s3))
        |SELECT step, step_name, n_users,
        |  CASE WHEN lag(n_users) OVER (ORDER BY step) > 0
        |    THEN round(CAST(n_users AS DOUBLE) / lag(n_users) OVER (ORDER BY step), 6)
        |  END AS conv_rate
        |FROM f ORDER BY step""".stripMargin,
    // the lang_id classifier CASE, cross-tabbed against the declared label
    "lang_confusion" ->
      """WITH p AS (
        |  SELECT lang,
        |    CASE WHEN e IS NULL THEN NULL
        |         WHEN greatest(e, de, es, fr, zh) = 0 THEN 'und'
        |         WHEN e  = greatest(e, de, es, fr, zh) THEN 'en'
        |         WHEN de = greatest(e, de, es, fr, zh) THEN 'de'
        |         WHEN es = greatest(e, de, es, fr, zh) THEN 'es'
        |         WHEN fr = greatest(e, de, es, fr, zh) THEN 'fr'
        |         ELSE 'zh' END AS lang_pred
        |  FROM (
        |    SELECT lang,
        |      len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS e,
        |      len(list_filter(toks, t -> t IN ('der','die','und','das','ein'))) AS de,
        |      len(list_filter(toks, t -> t IN ('el','la','de','los','una'))) AS es,
        |      len(list_filter(toks, t -> t IN ('le','la','les','des','une'))) AS fr,
        |      len(list_filter(toks, t -> t IN ('的','是','在','了','和'))) AS zh
        |    FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)))
        |SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END AS INTEGER) AS hit
        |FROM p GROUP BY 1, 2 ORDER BY lang, lang_pred""".stripMargin,
    "funnel_steps" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > epoch_us(s1.t)
        |    AND epoch_us(e.ts) - epoch_us(s1.t) <= 86400000000 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > epoch_us(s2.t)
        |    AND epoch_us(e.ts) - epoch_us(s2.t) <= 86400000000 GROUP BY e.user_id)
        |SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
        |  (SELECT count(*) FROM s1) AS n_users
        |UNION ALL SELECT CAST(2 AS INTEGER), 'click', (SELECT count(*) FROM s2)
        |UNION ALL SELECT CAST(3 AS INTEGER), 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    // hist_quantile: tolerance differential (see ScaleQueries.histQuantile)
    // — DuckDB pins the exact non-null row count (row conservation holds
    // for ANY cuts) and the invariant flags; the four-row shape itself
    // enforces bin exhaustiveness via rows_match.
    "hist_quantile" ->
      """SELECT t.bin, n.n_total,
        |  CAST(1 AS INTEGER) AS depth_ok, CAST(1 AS INTEGER) AS span_ok
        |FROM (VALUES (0), (1), (2), (3)) t(bin)
        |CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_total
        |            FROM orders WHERE o_totalprice IS NOT NULL) n
        |ORDER BY t.bin""".stripMargin,
    "profile_cols" ->
      """SELECT * FROM (
        |  SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    count(DISTINCT o_custkey) AS n_distinct FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', count(*),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_orderpriority) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*),
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT o_totalprice) FROM orders
        |) ORDER BY col_name""".stripMargin,
    "sample_group" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 20 ORDER BY source, doc_id""".stripMargin,
  )
}
