package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{Curation, Dedup, Events, Privacy, Profile, Similarity, TextAnalysis}

/** Round-10 audit/analytics queries: distribution drift (KS), data-quality
  * forensics (Benford), trade-off frontiers (Pareto skyline), behavioral
  * models (Markov transitions, CUSUM changepoints), weighted sampling,
  * embedding covariance, and asymmetric containment dedup. Same conventions
  * as [[Queries]]/[[ExtQueries]]/[[ScaleQueries]]: every key has a DuckDB
  * oracle mirroring the FP operation order token-for-token.
  */
object AuditQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  type Q = (SparkSession, String) => DataFrame

  /** Binned two-sample KS between the even/odd orderkey halves of orders —
    * same-distribution halves like [[ScaleQueries.driftPsi]], so the pin is
    * the cumulative arithmetic (the statistic itself is near 0). */
  val driftKs: Q = (s, d) => {
    val orders = t(s, d, "orders")
    Profile.ksDrift(
      orders.filter(col("o_orderkey") % 2 === 0),
      orders.filter(col("o_orderkey") % 2 === 1),
      "o_totalprice", nBins = 50)
      .orderBy("bin")
  }

  /** Benford first-digit audit of order totals. TPC-H prices are sums of
    * uniform-ish part prices, NOT multi-scale — the audit correctly reports
    * a large deviation from Benford (digit shares peak mid-range), which is
    * exactly the differentiating fixture signal. */
  val benfordAudit: Q = (s, d) =>
    Profile.benfordAudit(t(s, d, "orders"), "o_totalprice")
      .orderBy("digit")

  /** Pareto frontier of parts: maximize p_size, minimize p_retailprice —
    * the full staircase (one row per distinct size, on_frontier flag). */
  val paretoFrontier: Q = (s, d) =>
    Profile.paretoFrontier(t(s, d, "part"), "p_size", "p_retailprice")
      .orderBy("x")

  /** First-order Markov transition matrix of user event sequences. */
  val eventTransitions: Q = (s, d) =>
    Events.transitionMatrix(Tables.loadEvents(s, d),
      "user_id", "ts", "event_type", "event_id")
      .orderBy("from_type", "to_type")

  /** CUSUM changepoint scan over daily event counts. */
  val changepointCusum: Q = (s, d) =>
    Events.cusumChangepoint(Tables.loadEvents(s, d), "ts", "day")
      .orderBy("period")

  /** Token-mass-proportional document sample: 50 docs per language, drawn
    * with probability ∝ n_chars (Efraimidis–Spirakis, hash-stable). */
  val sampleWeighted: Q = (s, d) =>
    Curation.sampleWeightedPerStratum(t(s, d, "documents"),
      "doc_id", "lang", "n_chars", k = 50)
      .select("doc_id", "lang", "n_chars")
      .orderBy("lang", "doc_id")

  /** Upper-triangle covariance matrix of the first 8 embedding dims. */
  val embedCovariance: Q = (s, d) =>
    Similarity.covarianceMatrix(t(s, d, "embeddings"), "embedding", k = 8)
      .orderBy("i", "j")

  /** Asymmetric shingle containment over documents: near-superset pairs
    * Jaccard-only dedup misses. The hot-shingle guard stays at its default
    * (inactive at fixture scale — no shingle nears df 10000 — so the
    * unfiltered oracle matches; the guard is pinned separately in
    * DedupSpec). Display rounds to 4; the threshold applies UNROUNDED on
    * both sides, same contract as dedup_ngram. */
  val dedupContainment: Q = (s, d) =>
    Dedup.containmentPairs(t(s, d, "documents"), "doc_id", "text",
      shingleN = 3, minContainment = 0.8)
      .withColumn("c_a_in_b", round(col("c_a_in_b"), 4))
      .withColumn("c_b_in_a", round(col("c_b_in_a"), 4))
      .orderBy("a_id", "b_id")

  /** Zone-map skip audit on the ingest-ordered events table: zones of
    * 2000 consecutive event_ids (the "file" analog — the fixture's
    * event_id is ~perfectly time-ordered, corr ≈ 0.99998, exactly like a
    * real append-only ingest), value = event time, predicate
    * ts >= 2024-01-25. Most zones' ts ranges fall entirely before the
    * cutoff and flag skippable — the statistics-only I/O saving a
    * clustered layout buys. */
  val zoneMap: Q = (s, d) =>
    Profile.zoneSkipAudit(Tables.loadEvents(s, d),
      floor(col("event_id") / 2000).cast("long"), "ts",
      lit("2024-01-25").cast("timestamp"))
      .orderBy("zone")

  /** Entry-path distribution: each user's first 3 event types. */
  val sessionPaths: Q = (s, d) =>
    Events.pathSignatures(Tables.loadEvents(s, d),
      "user_id", "ts", "event_type", "event_id", depth = 3)
      .orderBy("path")

  /** Join-skew pre-flight for a prospective lineitem self-join on
    * l_partkey: the 20 keys whose count product dominates the output. */
  val joinSkew: Q = (s, d) => {
    val li = t(s, d, "lineitem")
    Profile.joinSkewAudit(li, li, "l_partkey", "l_partkey", topK = 20)
  }

  /** Joint density of lineitem (quantity × discount), 10×10 bins. */
  val hist2dQ: Q = (s, d) =>
    Profile.hist2d(t(s, d, "lineitem"), "l_quantity", "l_discount",
      nx = 10, ny = 10)
      .orderBy("bin_x", "bin_y")

  /** Mutual information between document language and source. */
  val mutualInfoQ: Q = (s, d) =>
    Profile.mutualInfo(t(s, d, "documents"), "lang", "source")
      .orderBy("lang", "source")

  /** Zipf rank-frequency fit over the top 500 corpus terms. */
  val zipfSlope: Q = (s, d) =>
    TextAnalysis.zipfSlope(t(s, d, "documents"), "text", topN = 500)

  /** Per-priority quantile drift between the even/odd orderkey halves —
    * same-distribution halves (the arithmetic pin, as drift_psi/drift_ks);
    * group-level quantile deltas are the differentiating signal shape. */
  val driftQuantile: Q = (s, d) => {
    val orders = t(s, d, "orders")
    Profile.quantileDrift(
      orders.filter(col("o_orderkey") % 2 === 0),
      orders.filter(col("o_orderkey") % 2 === 1),
      "o_orderpriority", "o_totalprice", ps = Seq(0.5, 0.95))
      .orderBy("o_orderpriority")
  }

  /** Weekly (dow × hour) traffic heatmap with cell shares. */
  val seasonality: Q = (s, d) =>
    Events.seasonalityProfile(Tables.loadEvents(s, d), "ts")
      .orderBy("dow", "hod")

  /** Language-composition entropy per document source. */
  val groupEntropyQ: Q = (s, d) =>
    Profile.groupEntropy(t(s, d, "documents"), "source", "lang")
      .orderBy("source")

  /** Per-user daily-count Fano factor (burstiness). */
  val userBurstiness: Q = (s, d) =>
    Events.burstiness(Tables.loadEvents(s, d), "user_id", "ts", "day")
      .orderBy("user_id")

  /** Revenue-concentration staircase over order-total deciles. */
  val lorenzCurve: Q = (s, d) =>
    Profile.lorenzCurve(t(s, d, "orders"), "o_totalprice", nBins = 10)
      .orderBy("bin")

  /** Hour slots scored against their own (dow × hod) seasonal baseline. */
  val seasonalAnomaly: Q = (s, d) =>
    Profile.seasonalAnomaly(Tables.loadEvents(s, d), "ts")
      .orderBy("slot")

  /** DAU / WAU / MAU / stickiness per day. */
  val activeUsers: Q = (s, d) =>
    Events.activeUsers(Tables.loadEvents(s, d), "user_id", "ts")
      .orderBy("day")

  /** Time-to-convert (first view → first purchase at/after it), exact
    * integer microseconds per converted user. */
  val conversionLag: Q = (s, d) =>
    Events.conversionLag(Tables.loadEvents(s, d),
      "user_id", "ts", "event_type", "view", "purchase")
      .orderBy("user_id")

  /** Order→ship latency profile per priority class: the classic fact-to-
    * fact equi-join (lineitem ⋈ orders on the order key — both sides
    * large, so this is a genuine shuffle join the engine must get right)
    * collapsed to integer day latencies and per-priority quantiles. */
  val shipLatency: Q = (s, d) => {
    val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    val o = t(s, d, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_days",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        min(col("lat_days")).as("min_days"),
        max(col("lat_days")).as("max_days"),
        round(percentile(col("lat_days"), lit(0.5)), 4).as("p50_days"),
        round(percentile(col("lat_days"), lit(0.95)), 4).as("p95_days"))
      .orderBy("o_orderpriority")
  }

  /** ABC revenue classes over customers (A = head carrying 80% of order
    * mass, B = to 95%, C = tail), binned at 20 quantile bins. */
  val abcClass: Q = (s, d) =>
    Profile.abcClasses(t(s, d, "orders"), "o_custkey", "o_totalprice",
      nBins = 20)
      .orderBy("o_custkey")

  /** Sketch-path active users: per-day HLL sketches unioned over trailing
    * windows, flag-differential vs the exact counts (agg_sketch pattern:
    * exact values oracle-recomputed, within-tolerance flags pinned 1). */
  val activeUsersHll: Q = (s, d) =>
    Events.activeUsersSketch(Tables.loadEvents(s, d), "user_id", "ts")
      .orderBy("day")

  /** Per-vector alignment with the own-label spherical centroid — the
    * vector-granular mislabel detector next to label_cohesion's
    * label-granular score. */
  val embedOutliers: Q = (s, d) =>
    Similarity.centroidAlignment(t(s, d, "embeddings"),
      "vec_id", "label", "embedding")
      .orderBy("vec_id")

  /** Hourly event-value sums scored against the (dow × hod) baseline —
    * the revenue twin of seasonal_anomaly. */
  val seasonalValueZ: Q = (s, d) =>
    Profile.seasonalValueAnomaly(Tables.loadEvents(s, d), "ts", "value")
      .orderBy("slot")

  /** Hourly-count autocorrelation at daily-rhythm lags. The fixture's
    * arrivals are near-uniform, so the pinned signal is the exact-integer
    * correlation arithmetic (values near 0), not a seasonal peak. */
  val autocorrLagQ: Q = (s, d) =>
    Events.autocorrLag(Tables.loadEvents(s, d), "ts", Seq(1, 24, 168))
      .orderBy("lag")

  /** l-diversity over (priority, order day) classes with order status as
    * the sensitive attribute — classes that are k-large can still be
    * status-homogeneous, which is what the audit surfaces. */
  val lDiversityQ: Q = (s, d) =>
    Privacy.lDiversity(
      t(s, d, "orders").withColumn("o_day", col("o_orderdate").cast("date")),
      Seq("o_orderpriority", "o_day"), "o_orderstatus", l = 2)
      .orderBy("o_orderpriority", "o_day")

  /** RFM quintile scores per customer over the orders table. */
  val rfmScoresQ: Q = (s, d) =>
    Profile.rfmScores(t(s, d, "orders"), "o_custkey", "o_orderdate",
      "o_totalprice")
      .orderBy("o_custkey")

  /** First/last-touch conversion attribution over the event stream;
    * purchases with no prior touchpoint surface as the NULL channel. */
  val attributionQ: Q = (s, d) =>
    Events.attributionCounts(Tables.loadEvents(s, d),
      "user_id", "ts", "event_type", "event_id", conversion = "purchase")
      .orderBy("model", "channel")

  /** Interval-union coverage: 60-second activity windows around each
    * event, merged per user — active time counted once under overlap. */
  val intervalUnionQ: Q = (s, d) => {
    val ev = Tables.loadEvents(s, d)
    graft.operators.Temporal.intervalUnion(
      ev.select(col("user_id"), col("ts").as("s0"),
        (col("ts") + expr("INTERVAL 60 SECONDS")).as("e0")),
      "user_id", "s0", "e0")
      .orderBy("key")
  }

  /** Centered ±12h moving-average trend + residuals over the hourly
    * count series. */
  val trendDecomposeQ: Q = (s, d) =>
    Events.trendDecompose(Tables.loadEvents(s, d), "ts", halfWindow = 12)
      .orderBy("hr")

  /** Daily new-vs-returning user split. */
  val userGrowthQ: Q = (s, d) =>
    Events.userGrowth(Tables.loadEvents(s, d), "user_id", "ts")
      .orderBy("day")

  /** Welch two-sample t over event values, variants split on user parity. */
  val abWelch: Q = (s, d) =>
    Profile.welchTTest(
      Tables.loadEvents(s, d).withColumn("variant",
        when(col("user_id") % 2 === 0, "control").otherwise("variant")),
      "variant", "value")

  /** Part co-occurrence lift over order baskets (≥2 shared orders). */
  val basketLiftQ: Q = (s, d) =>
    Profile.cooccurrenceLift(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
      minPairCount = 2)
      .orderBy("item_a", "item_b")

  val all: Map[String, Q] = Map(
    "seasonal_value_z" -> seasonalValueZ,
    "embed_outliers" -> embedOutliers,
    "active_users_hll" -> activeUsersHll,
    "abc_class" -> abcClass,
    "conversion_lag" -> conversionLag,
    "ship_latency" -> shipLatency,
    "lorenz_curve" -> lorenzCurve,
    "seasonal_anomaly" -> seasonalAnomaly,
    "active_users" -> activeUsers,
    "drift_quantile" -> driftQuantile,
    "seasonality" -> seasonality,
    "group_entropy" -> groupEntropyQ,
    "user_burstiness" -> userBurstiness,
    "drift_ks" -> driftKs,
    "benford_audit" -> benfordAudit,
    "pareto_frontier" -> paretoFrontier,
    "event_transitions" -> eventTransitions,
    "changepoint_cusum" -> changepointCusum,
    "sample_weighted" -> sampleWeighted,
    "embed_covariance" -> embedCovariance,
    "dedup_containment" -> dedupContainment,
    "zone_map" -> zoneMap,
    "session_paths" -> sessionPaths,
    "join_skew" -> joinSkew,
    "hist2d" -> hist2dQ,
    "mutual_info" -> mutualInfoQ,
    "zipf_slope" -> zipfSlope,
    "autocorr_lag" -> autocorrLagQ,
    "l_diversity" -> lDiversityQ,
    "rfm_scores" -> rfmScoresQ,
    "basket_lift" -> basketLiftQ,
    "attribution" -> attributionQ,
    "interval_union" -> intervalUnionQ,
    "ab_welch" -> abWelch,
    "trend_decompose" -> trendDecomposeQ,
    "user_growth" -> userGrowthQ
  )

  /** The 36 upper-triangle covar_pop entries for embed_covariance, unrolled
    * as UNION ALL branches over the single-row aggregate CTE. */
  private val covTriangle: String = {
    val dims = 0 until 8
    val aggs = (for { i <- dims; j <- dims if i <= j } yield
      s"covar_pop(embedding[${i + 1}]::DOUBLE, embedding[${j + 1}]::DOUBLE) AS c_${i}_$j")
      .mkString(",\n    ")
    val rows = (for { i <- dims; j <- dims if i <= j } yield
      s"SELECT $i AS i, $j AS j, round(c_${i}_$j, 6) AS cov FROM w")
      .mkString("\n  UNION ALL ")
    s"""WITH w AS (
       |  SELECT $aggs
       |  FROM embeddings)
       |$rows
       |ORDER BY i, j""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // exact cents into one sqrt and one division (the seasonal_anomaly
    // arithmetic over value sums); duckdb's HUGEINT meets spark's
    // decimal(38,0) on the same exact integers
    "seasonal_value_z" ->
      """WITH slots AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slot,
        |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100, 0) AS BIGINT))
        |      AS BIGINT) AS sum_cents
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s2 AS (
        |  SELECT slot, sum_cents,
        |    CAST(dayofweek(slot) + 1 AS INTEGER) AS dow,
        |    CAST(hour(slot) AS INTEGER) AS hod
        |  FROM slots),
        |cells AS (
        |  SELECT dow, hod, CAST(count(*) AS BIGINT) AS k,
        |    sum(sum_cents) AS s, sum(sum_cents * sum_cents) AS sq
        |  FROM s2 GROUP BY 1, 2)
        |SELECT slot, s2.dow AS dow, s2.hod AS hod, sum_cents, k,
        |  CASE WHEN k > 1 AND k * sq - s * s > 0
        |    THEN CAST(k * sum_cents - s AS DOUBLE)
        |      / sqrt(CAST(k * sq - s * s AS DOUBLE))
        |  END AS z
        |FROM s2 JOIN cells ON s2.dow = cells.dow AND s2.hod = cells.hod
        |ORDER BY slot""".stripMargin,
    // unitize mirrors VectorFns.unitizeNative (float->double widening,
    // same op order); the centroid series is the fixture's 64 dims (all
    // SFs — a dim change would surface as loud NULL-cos mismatches, not
    // silent drift); flag compares the UNROUNDED ratio, display rounds 4
    "embed_outliers" ->
      """WITH u AS (
        |  SELECT vec_id, label, list_transform(v0, x -> x / nrm) AS v FROM (
        |    SELECT vec_id, label, v0, sqrt(list_sum([x * x for x in v0])) AS nrm FROM (
        |      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
        |      FROM embeddings))
        |  WHERE nrm > 0 AND isfinite(nrm)),
        |m AS (
        |  SELECT label, i AS p, avg(v[i]) AS mv
        |  FROM u CROSS JOIN generate_series(1, 64) t(i) GROUP BY 1, 2),
        |c AS (SELECT label, list(mv ORDER BY p) AS cm FROM m GROUP BY 1),
        |s AS (
        |  SELECT vec_id, u.label AS label,
        |    list_sum([u.v[i] * c.cm[i] for i in generate_series(1, len(u.v))]) AS d,
        |    sqrt(list_sum([x * x for x in c.cm])) AS nm
        |  FROM u JOIN c ON u.label = c.label)
        |SELECT vec_id, label,
        |  CASE WHEN nm > 0 THEN round(d / nm, 4) END AS cos_c,
        |  CASE WHEN nm > 0
        |    THEN CAST(CASE WHEN round(d / nm, 4) < 0.0 THEN 1 ELSE 0 END AS INTEGER)
        |  END AS anti_aligned
        |FROM s ORDER BY vec_id""".stripMargin,
    // exact dau/wau/mau oracle-recomputed; the HLL estimates cannot be
    // recomputed in DuckDB, so the within-tolerance flags pin to 1 (the
    // agg_sketch differential pattern — a drifting sketch flips the flag
    // to 0 on the Spark side and the compare fails loudly)
    "active_users_hll" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
        |  FROM events),
        |spine AS (SELECT DISTINCT day FROM daily),
        |dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM daily GROUP BY 1),
        |wau AS (
        |  SELECT s.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau
        |  FROM spine s JOIN daily d
        |    ON d.day > s.day - INTERVAL 7 DAY AND d.day <= s.day
        |  GROUP BY 1),
        |mau AS (
        |  SELECT s.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS mau
        |  FROM spine s JOIN daily d
        |    ON d.day > s.day - INTERVAL 30 DAY AND d.day <= s.day
        |  GROUP BY 1)
        |SELECT day, dau, wau, mau,
        |  CAST(1 AS INTEGER) AS wau_ok, CAST(1 AS INTEGER) AS mau_ok
        |FROM dau JOIN wau USING (day) JOIN mau USING (day)
        |ORDER BY day""".stripMargin,
    // fixed-point cents per entity, quantile_bin cuts, cumulative over
    // the DESC-ordered bins; class cuts compare exact longs against one
    // double product (0.8 * total) in both engines
    "abc_class" ->
      """WITH pk AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |    AS BIGINT) AS mass_cents
        |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT list_transform(
        |    quantile_cont(CAST(mass_cents AS DOUBLE),
        |      [0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.35, 0.4, 0.45, 0.5,
        |       0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85, 0.9, 0.95]),
        |    x -> round(x, 4)) AS cuts
        |  FROM pk),
        |b AS (
        |  SELECT o_custkey, mass_cents,
        |    CAST(len(list_filter(cuts, q -> q <= mass_cents)) AS INTEGER) AS bin
        |  FROM pk CROSS JOIN c),
        |bins AS (SELECT bin, CAST(sum(mass_cents) AS BIGINT) AS m FROM b GROUP BY 1),
        |w AS (
        |  SELECT bin, m,
        |    sum(m) OVER (ORDER BY bin DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
        |    sum(m) OVER () AS total
        |  FROM bins),
        |cl AS (
        |  SELECT bin,
        |    CASE WHEN prev IS NULL OR CAST(prev AS DOUBLE) < 0.8 * total THEN 'A'
        |      WHEN CAST(prev AS DOUBLE) < 0.95 * total THEN 'B'
        |      ELSE 'C' END AS abc_class
        |  FROM w)
        |SELECT o_custkey, mass_cents, b.bin, abc_class
        |FROM b JOIN cl ON b.bin = cl.bin ORDER BY o_custkey""".stripMargin,
    // lag stays exact integer micros (epoch_us both sides, no division)
    "conversion_lag" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS first_from
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, v.first_from, min(e.ts) AS first_to
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= v.first_from
        |  GROUP BY 1, 2)
        |SELECT user_id, first_from, first_to,
        |  CAST(epoch_us(first_to) - epoch_us(first_from) AS BIGINT) AS lag_us
        |FROM p ORDER BY user_id""".stripMargin,
    // integer day diffs; quantile_cont over integers mirrors spark's
    // percentile with the shared round-4 gate (group_quantiles precedent)
    "ship_latency" ->
      """WITH j AS (
        |  SELECT o_orderpriority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS INTEGER) AS lat_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(min(lat_days) AS INTEGER) AS min_days,
        |  CAST(max(lat_days) AS INTEGER) AS max_days,
        |  round(quantile_cont(lat_days, 0.50), 4) AS p50_days,
        |  round(quantile_cont(lat_days, 0.95), 4) AS p95_days
        |FROM j GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,
    // quantile_bin's cut arithmetic (quantile_cont list, round 4, count
    // of cuts <= x), then FIXED-POINT cents: integer sums are exact and
    // every ratio is one division of exact BIGINTs — no rounding gates
    "lorenz_curve" ->
      """WITH c AS (
        |  SELECT list_transform(
        |    quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
        |    x -> round(x, 4)) AS cuts
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |b AS (
        |  SELECT CAST(len(list_filter(cuts, c2 -> c2 <= o_totalprice)) AS INTEGER) AS bin,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders CROSS JOIN c WHERE o_totalprice IS NOT NULL),
        |a AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM b GROUP BY 1),
        |w AS (
        |  SELECT bin, n, cents,
        |    CAST(sum(cents) OVER () AS BIGINT) AS total,
        |    CAST(sum(cents) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM a)
        |SELECT bin, n, CAST(cents AS DOUBLE) / 100 AS mass,
        |  CAST(cents AS DOUBLE) / total AS share,
        |  CAST(cum AS DOUBLE) / total AS cum_share
        |FROM w ORDER BY bin""".stripMargin,
    // z = (k*n - s)/sqrt(k*sq - s^2): exact integers into one sqrt and
    // one division — bit-identical, no gates; dow mirrors spark (+1)
    "seasonal_anomaly" ->
      """WITH slots AS (
        |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS slot,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |s2 AS (
        |  SELECT slot, n, CAST(dayofweek(slot) + 1 AS INTEGER) AS dow,
        |    CAST(hour(slot) AS INTEGER) AS hod
        |  FROM slots),
        |cells AS (
        |  SELECT dow, hod, CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS sq
        |  FROM s2 GROUP BY 1, 2)
        |SELECT slot, s2.dow AS dow, s2.hod AS hod, n, k,
        |  CASE WHEN k > 1 AND k * sq - s * s > 0
        |    THEN CAST(k * n - s AS DOUBLE) / sqrt(CAST(k * sq - s * s AS DOUBLE))
        |  END AS z
        |FROM s2 JOIN cells ON s2.dow = cells.dow AND s2.hod = cells.hod
        |ORDER BY slot""".stripMargin,
    // trailing windows are (day-w, day] range joins against the distinct
    // (day, user) table; stickiness is one BIGINT division
    "active_users" ->
      """WITH daily AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
        |  FROM events),
        |spine AS (SELECT DISTINCT day FROM daily),
        |dau AS (
        |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM daily GROUP BY 1),
        |wau AS (
        |  SELECT s.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS wau
        |  FROM spine s JOIN daily d
        |    ON d.day > s.day - INTERVAL 7 DAY AND d.day <= s.day
        |  GROUP BY 1),
        |mau AS (
        |  SELECT s.day, CAST(count(DISTINCT d.user_id) AS BIGINT) AS mau
        |  FROM spine s JOIN daily d
        |    ON d.day > s.day - INTERVAL 30 DAY AND d.day <= s.day
        |  GROUP BY 1)
        |SELECT day, dau, wau, mau, CAST(dau AS DOUBLE) / mau AS stickiness
        |FROM dau JOIN wau USING (day) JOIN mau USING (day)
        |ORDER BY day""".stripMargin,
    // quantile_cont mirrors spark's percentile (linear interpolation);
    // deltas subtract the ROUNDED quantiles, as the operator does
    "drift_quantile" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.50), 4) AS p50_ref,
        |    round(quantile_cont(o_totalprice, 0.95), 4) AS p95_ref
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |c AS (
        |  SELECT o_orderpriority,
        |    round(quantile_cont(o_totalprice, 0.50), 4) AS p50_cmp,
        |    round(quantile_cont(o_totalprice, 0.95), 4) AS p95_cmp
        |  FROM orders WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL
        |  GROUP BY 1)
        |SELECT COALESCE(r.o_orderpriority, c.o_orderpriority) AS o_orderpriority,
        |  p50_ref, p95_ref, p50_cmp, p95_cmp,
        |  round(p50_cmp - p50_ref, 4) AS d_p50,
        |  round(p95_cmp - p95_ref, 4) AS d_p95
        |FROM r FULL JOIN c ON r.o_orderpriority = c.o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    // duckdb dayofweek: Sunday = 0; spark: Sunday = 1 -> +1
    "seasonality" ->
      """WITH cells AS (
        |  SELECT CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
        |    CAST(hour(ts) AS INTEGER) AS hod,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT dow, hod, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (), 6) AS share
        |FROM cells ORDER BY dow, hod""".stripMargin,
    // entropy terms -(c/n)*ln(c/n) summed then rounded 6, evenness over
    // ln(n_cats); single-category groups report NULL evenness. Group
    // totals ride a window PARTITION BY (not an equality join): the Spark
    // operator keeps a NULL group as its own row, and a join on
    // `source = source` would silently drop it — PARTITION BY and GROUP
    // BY both treat NULL as one real group
    "group_entropy" ->
      """WITH cells AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |w AS (
        |  SELECT source, c,
        |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_cats
        |  FROM cells),
        |g AS (
        |  SELECT source, max(n) AS n, max(n_cats) AS n_cats,
        |    round(sum(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy
        |  FROM w GROUP BY source)
        |SELECT source, n, n_cats, entropy,
        |  CASE WHEN n_cats > 1
        |    THEN round(entropy / ln(CAST(n_cats AS DOUBLE)), 6) END AS evenness
        |FROM g ORDER BY source""".stripMargin,
    // every statistic is ONE division of exact integer aggregates —
    // bit-identical across engines, so NO rounding gate (see
    // Events.burstiness on why a round-4 gate is unstable here); NULL
    // var/fano for single-period actors on both sides
    "user_burstiness" ->
      """WITH per AS (
        |  SELECT user_id, date_trunc('day', ts) AS p,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_periods,
        |    CAST(sum(n) AS BIGINT) AS s,
        |    CAST(sum(n * n) AS BIGINT) AS sq
        |  FROM per GROUP BY 1)
        |SELECT user_id, n_periods,
        |  CAST(s AS DOUBLE) / n_periods AS mean_n,
        |  CASE WHEN n_periods > 1
        |    THEN CAST(n_periods * sq - s * s AS DOUBLE) / (n_periods * n_periods)
        |  END AS var_n,
        |  CASE WHEN n_periods > 1 AND s > 0
        |    THEN CAST(n_periods * sq - s * s AS DOUBLE) / (n_periods * s)
        |  END AS fano
        |FROM agg ORDER BY user_id""".stripMargin,
    // binning mirrors drift_psi's token-for-token (bounds from the even
    // half, clamp, 50 bins); cumulative shares round to 6 BEFORE the gap
    "drift_ks" ->
      """WITH b AS (
        |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
        |  FROM orders WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL),
        |ra AS (
        |  SELECT CAST(CASE WHEN hi = lo THEN 0
        |    ELSE greatest(least(floor((o_totalprice - lo) * 50 / (hi - lo)), 49), 0)
        |    END AS INTEGER) AS bin, count(*) AS n_ref
        |  FROM orders, b WHERE o_orderkey % 2 = 0 AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |rb AS (
        |  SELECT CAST(CASE WHEN hi = lo THEN 0
        |    ELSE greatest(least(floor((o_totalprice - lo) * 50 / (hi - lo)), 49), 0)
        |    END AS INTEGER) AS bin, count(*) AS n_cmp
        |  FROM orders, b WHERE o_orderkey % 2 = 1 AND o_totalprice IS NOT NULL
        |  GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(ra.bin, rb.bin) AS bin,
        |    COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cmp, 0) AS n_cmp
        |  FROM ra FULL JOIN rb ON ra.bin = rb.bin),
        |c AS (
        |  SELECT bin,
        |    round(CAST(sum(n_ref) OVER (ORDER BY bin
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      / sum(n_ref) OVER (), 6) AS cum_p_ref,
        |    round(CAST(sum(n_cmp) OVER (ORDER BY bin
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      / sum(n_cmp) OVER (), 6) AS cum_p_cmp
        |  FROM j)
        |SELECT bin, cum_p_ref, cum_p_cmp,
        |  round(abs(cum_p_ref - cum_p_cmp), 6) AS ks_term
        |FROM c ORDER BY bin""".stripMargin,
    // leading digit computed ARITHMETICALLY (floor/log10/pow — both
    // engines correctly rounded), never via double→string formatting;
    // dev subtracts the ROUNDED shares, mirroring the Spark column refs
    "benford_audit" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice IS NOT NULL AND o_totalprice > 0
        |    THEN CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice))))
        |      AS INTEGER) END AS digit
        |  FROM orders),
        |tallied AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |ex AS (
        |  SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_excluded
        |  FROM tallied WHERE digit IS NULL),
        |g AS (SELECT digit, n FROM tallied WHERE digit IS NOT NULL),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit),
        |p AS (
        |  SELECT spine.digit, CAST(COALESCE(g.n, 0) AS BIGINT) AS n, n_excluded,
        |    round(CAST(COALESCE(g.n, 0) AS DOUBLE)
        |      / sum(COALESCE(g.n, 0)) OVER (), 6) AS p_obs,
        |    round(log10(1 + 1.0 / spine.digit), 6) AS p_benford
        |  FROM spine LEFT JOIN g ON spine.digit = g.digit CROSS JOIN ex)
        |SELECT digit, n, n_excluded, p_obs, p_benford,
        |  round(p_obs - p_benford, 6) AS dev
        |FROM p ORDER BY digit""".stripMargin,
    "pareto_frontier" ->
      """WITH perx AS (
        |  SELECT p_size AS x, min(p_retailprice) AS best_y,
        |    CAST(count(*) AS BIGINT) AS n_at_x
        |  FROM part WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
        |  GROUP BY 1),
        |f AS (
        |  SELECT x, best_y, n_at_x,
        |    min(best_y) OVER (ORDER BY x DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |  FROM perx)
        |SELECT x, best_y, n_at_x,
        |  CAST(CASE WHEN prev IS NULL OR best_y < prev THEN 1 ELSE 0 END
        |    AS INTEGER) AS on_frontier
        |FROM f ORDER BY x""".stripMargin,
    // lead over (user, ts, event_id) — the deterministic tie-break the
    // Spark window uses; the probability divides over the tiny aggregate
    "event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_type), 6)
        |    AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // CAST duckdb's DATE date_trunc to TIMESTAMP (spark's stays TIMESTAMP);
    // cusum sums (n - mean) in the same order, rounds 4; is_peak compares
    // the ROUNDED cusum against its own max
    "changepoint_cusum" ->
      """WITH per AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS period,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT avg(n) AS mean FROM per),
        |c AS (
        |  SELECT period, n,
        |    round(sum(CAST(n AS DOUBLE) - mean) OVER (
        |      ORDER BY period ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      4) + 0.0 AS cusum
        |  FROM per CROSS JOIN m)
        |SELECT period, n, cusum,
        |  CAST(CASE WHEN abs(cusum) = max(abs(cusum)) OVER () THEN 1 ELSE 0 END
        |    AS INTEGER) AS is_peak
        |FROM c ORDER BY period""".stripMargin,
    // the Efraimidis–Spirakis draw mirrored exactly: u from the first 8
    // md5 hex chars of the salted id, score = -ln(u)/w, k smallest per
    // stratum with id tie-break
    "sample_weighted" ->
      """WITH s AS (
        |  SELECT doc_id, lang, n_chars,
        |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|wsample'), 1, 8))::BIGINT
        |        + 0.5) / 4294967296.0) / n_chars AS score
        |  FROM documents WHERE doc_id IS NOT NULL),
        |r AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn
        |  FROM s)
        |SELECT doc_id, lang, n_chars FROM r WHERE rn <= 50
        |ORDER BY lang, doc_id""".stripMargin,
    "embed_covariance" -> covTriangle,
    // floor(event_id / 2000): both engines divide as doubles; duckdb's
    // floor yields DOUBLE -> cast BIGINT to match spark's LONG
    "zone_map" ->
      """SELECT CAST(floor(event_id / 2000) AS BIGINT) AS zone,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  min(ts) AS v_min, max(ts) AS v_max,
        |  CAST(CASE WHEN max(ts) < TIMESTAMP '2024-01-25' THEN 1 ELSE 0 END
        |    AS INTEGER) AS skippable
        |FROM events GROUP BY 1 ORDER BY zone""".stripMargin,
    // string_agg with ORDER BY rn mirrors the sorted-struct reassembly
    "session_paths" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM r WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_actors
        |FROM p GROUP BY 1 ORDER BY path""".stripMargin,
    "join_skew" ->
      """WITH l AS (
        |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_left
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
        |r AS (
        |  SELECT l_partkey AS key, CAST(count(*) AS BIGINT) AS n_right
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
        |SELECT key, n_left, n_right,
        |  CAST(n_left AS DOUBLE) * n_right AS est_pairs
        |FROM l JOIN r USING (key)
        |ORDER BY est_pairs DESC, key LIMIT 20""".stripMargin,
    // per-axis binning mirrors hist_bins' arithmetic; values cast to
    // DOUBLE before the bin expression exactly as the Spark side does
    "hist2d" ->
      """WITH b AS (
        |  SELECT min(CAST(l_quantity AS DOUBLE)) AS xlo,
        |    max(CAST(l_quantity AS DOUBLE)) AS xhi,
        |    min(CAST(l_discount AS DOUBLE)) AS ylo,
        |    max(CAST(l_discount AS DOUBLE)) AS yhi
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL)
        |SELECT
        |  CAST(CASE WHEN xhi = xlo THEN 0
        |    ELSE least(floor((CAST(l_quantity AS DOUBLE) - xlo) * 10 / (xhi - xlo)), 9)
        |    END AS INTEGER) AS bin_x,
        |  CAST(CASE WHEN yhi = ylo THEN 0
        |    ELSE least(floor((CAST(l_discount AS DOUBLE) - ylo) * 10 / (yhi - ylo)), 9)
        |    END AS INTEGER) AS bin_y,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem, b
        |WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same cell/marginal CTEs as chi_square; the term's operation order
    // (obs/n) * ln((obs*n)/(rt*ct)) is pinned on both sides
    "mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(obs) AS BIGINT) AS ct FROM cells GROUP BY 1),
        |n AS (SELECT CAST(sum(obs) AS DOUBLE) AS n FROM cells)
        |SELECT c.lang, c.source, c.obs,
        |  round((CAST(obs AS DOUBLE) / n)
        |    * ln((CAST(obs AS DOUBLE) * n)
        |      / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))), 6) AS mi_term
        |FROM cells c JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN n
        |ORDER BY lang, source""".stripMargin,
    // top-500 cut uses the same total (freq DESC, term) ordering as
    // Spark's TakeOrdered, so the kept set is identical; ln over BIGINT
    // freq/rank matches Spark's log over LONG
    "zipf_slope" ->
      """WITH t AS (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |c AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS freq
        |  FROM t WHERE term <> '' GROUP BY 1
        |  ORDER BY freq DESC, term LIMIT 500),
        |r AS (
        |  SELECT freq,
        |    row_number() OVER (ORDER BY freq DESC, term) AS rank
        |  FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  round(regr_slope(ln(freq), ln(rank)), 4) AS slope,
        |  round(regr_intercept(ln(freq), ln(rank)), 4) AS intercept,
        |  round(regr_r2(ln(freq), ln(rank)), 4) AS r2
        |FROM r""".stripMargin,
    // containment thresholds apply UNROUNDED (same as dedup_ngram's
    // jaccard); round 4 for display only
    "dedup_containment" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id,
        |    unnest([array_to_string(toks[i:i+2], ' ') for i in generate_series(1, len(toks)-2)]) AS s
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(count(*) AS DOUBLE) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  round(i / na.n, 4) AS c_a_in_b,
        |  round(i / nb.n, 4) AS c_b_in_a
        |FROM inter
        |JOIN sz na ON na.doc_id = a_id
        |JOIN sz nb ON nb.doc_id = b_id
        |WHERE i / na.n >= 0.8e0 OR i / nb.n >= 0.8e0
        |ORDER BY a_id, b_id""".stripMargin,
    // dense hour spine (silent hours = 0), map-side hour index from the
    // bounds, lag self-join of the spine, and the house exact-integer corr:
    // two sqrt's of exact BIGINTs kept SEPARATE (their product can pass
    // 2^53), one multiply, one division — bit-identical, no gate
    "autocorr_lag" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        |  FROM events WHERE ts IS NOT NULL),
        |sp AS (SELECT h0, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM b),
        |c AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |      FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |s AS (
        |  SELECT CAST(date_diff('hour', sp.h0, sp.hr) AS BIGINT) AS i,
        |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |  FROM sp LEFT JOIN c USING (hr)),
        |agg AS (
        |  SELECT l.lag, CAST(count(*) AS BIGINT) AS np,
        |    CAST(sum(a.n) AS BIGINT) AS sx, CAST(sum(bb.n) AS BIGINT) AS sy,
        |    CAST(sum(a.n*a.n) AS BIGINT) AS sxx, CAST(sum(bb.n*bb.n) AS BIGINT) AS syy,
        |    CAST(sum(a.n*bb.n) AS BIGINT) AS sxy
        |  FROM (SELECT CAST(unnest([1, 24, 168]) AS BIGINT) AS lag) l
        |  JOIN s a ON TRUE JOIN s bb ON bb.i = a.i + l.lag
        |  GROUP BY 1)
        |SELECT CAST(lag AS INTEGER) AS lag, np AS n_pairs,
        |  CASE WHEN np*sxx - sx*sx > 0 AND np*syy - sy*sy > 0 THEN
        |    CAST(np*sxy - sx*sy AS DOUBLE)
        |      / (sqrt(CAST(np*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(np*syy - sy*sy AS DOUBLE)))
        |  END AS r
        |FROM agg ORDER BY lag""".stripMargin,
    "l_diversity" ->
      """SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS o_day,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS l_distinct,
        |  CAST(CASE WHEN count(DISTINCT o_orderstatus) < 2 THEN 1 ELSE 0 END
        |    AS INTEGER) AS at_risk
        |FROM orders
        |GROUP BY 1, 2 ORDER BY o_orderpriority, o_day""".stripMargin,
    // integer-grid quintiles rounded 4 on both sides; recency cuts via the
    // affine identity maxdd - q_{1-p}(dd); money fixed-point to cents
    // BEFORE summing (exact BIGINT) — see Profile.rfmScores
    "rfm_scores" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    CAST(max(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)))
        |      AS BIGINT) AS dd,
        |    CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS m_cents
        |  FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        |  GROUP BY 1),
        |st AS (
        |  SELECT max(dd) AS maxdd,
        |    round(quantile_cont(CAST(f AS DOUBLE), 0.2), 4) AS f0,
        |    round(quantile_cont(CAST(f AS DOUBLE), 0.4), 4) AS f1,
        |    round(quantile_cont(CAST(f AS DOUBLE), 0.6), 4) AS f2,
        |    round(quantile_cont(CAST(f AS DOUBLE), 0.8), 4) AS f3,
        |    round(quantile_cont(CAST(m_cents AS DOUBLE), 0.2), 4) AS m0,
        |    round(quantile_cont(CAST(m_cents AS DOUBLE), 0.4), 4) AS m1,
        |    round(quantile_cont(CAST(m_cents AS DOUBLE), 0.6), 4) AS m2,
        |    round(quantile_cont(CAST(m_cents AS DOUBLE), 0.8), 4) AS m3,
        |    round(quantile_cont(CAST(dd AS DOUBLE), 0.8), 4) AS r0,
        |    round(quantile_cont(CAST(dd AS DOUBLE), 0.6), 4) AS r1,
        |    round(quantile_cont(CAST(dd AS DOUBLE), 0.4), 4) AS r2,
        |    round(quantile_cont(CAST(dd AS DOUBLE), 0.2), 4) AS r3
        |  FROM per)
        |SELECT o_custkey, maxdd - dd AS r_days, f, m_cents,
        |  CAST(6 - (1
        |    + (CASE WHEN CAST(maxdd - dd AS DOUBLE) > maxdd - r0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(maxdd - dd AS DOUBLE) > maxdd - r1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(maxdd - dd AS DOUBLE) > maxdd - r2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(maxdd - dd AS DOUBLE) > maxdd - r3 THEN 1 ELSE 0 END))
        |    AS INTEGER) AS r_score,
        |  CAST(1
        |    + (CASE WHEN CAST(f AS DOUBLE) > f0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(f AS DOUBLE) > f1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(f AS DOUBLE) > f2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(f AS DOUBLE) > f3 THEN 1 ELSE 0 END)
        |    AS INTEGER) AS f_score,
        |  CAST(1
        |    + (CASE WHEN CAST(m_cents AS DOUBLE) > m0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(m_cents AS DOUBLE) > m1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(m_cents AS DOUBLE) > m2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN CAST(m_cents AS DOUBLE) > m3 THEN 1 ELSE 0 END)
        |    AS INTEGER) AS m_score
        |FROM per, st ORDER BY o_custkey""".stripMargin,
    // one window pass with IGNORE NULLS running first/last over the
    // strictly-preceding frame, mirrored token-for-token; NULLS FIRST
    // matches Spark's ascending NULL ordering
    "attribution" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_nc,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_nc
        |  FROM events)
        |SELECT 'first_touch' AS model, first_nc AS channel,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM w WHERE event_type = 'purchase' GROUP BY 2
        |UNION ALL
        |SELECT 'last_touch', last_nc, CAST(count(*) AS BIGINT)
        |FROM w WHERE event_type = 'purchase' GROUP BY 2
        |ORDER BY model, channel NULLS FIRST""".stripMargin,
    // gaps-and-islands on exact epoch micros: running max end (preceding
    // frame), island flags, island spans — integers end to end
    "interval_union" ->
      """WITH iv AS (
        |  SELECT user_id AS key, epoch_us(ts) AS s,
        |    epoch_us(ts + INTERVAL 60 SECOND) AS e
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (
        |  SELECT key, s, e,
        |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY key ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |      -9223372036854775808) THEN 1 ELSE 0 END AS ni
        |  FROM iv),
        |i AS (
        |  SELECT key, s, e, sum(ni) OVER (PARTITION BY key ORDER BY s, e
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m),
        |g AS (
        |  SELECT key, island, count(*) AS n, max(e) - min(s) AS span
        |  FROM i GROUP BY 1, 2)
        |SELECT key, CAST(sum(n) AS BIGINT) AS n_intervals,
        |  CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(span) AS BIGINT) AS covered_us
        |FROM g GROUP BY key ORDER BY key""".stripMargin,
    // dense spine + one window over the |hours| series; trend is an
    // explicit sum/count division (never a sliding avg, whose incremental
    // accumulator differs across engines); resid repeats it token-for-token
    "trend_decompose" ->
      """WITH b AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        |  FROM events WHERE ts IS NOT NULL),
        |sp AS (SELECT h0, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM b),
        |c AS (SELECT date_trunc('hour', ts) AS hr, count(*) AS n
        |      FROM events WHERE ts IS NOT NULL GROUP BY 1),
        |s AS (
        |  SELECT sp.hr, CAST(date_diff('hour', sp.h0, sp.hr) AS BIGINT) AS i,
        |    CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        |  FROM sp LEFT JOIN c USING (hr))
        |SELECT CAST(hr AS TIMESTAMP) AS hr, n,
        |  CAST(sum(n) OVER w AS DOUBLE) / CAST(count(n) OVER w AS DOUBLE) AS trend,
        |  CAST(n AS DOUBLE)
        |    - CAST(sum(n) OVER w AS DOUBLE) / CAST(count(n) OVER w AS DOUBLE) AS resid
        |FROM s
        |WINDOW w AS (ORDER BY i ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
        |ORDER BY hr""".stripMargin,
    "user_growth" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fd AS (SELECT u, min(day) AS fday FROM ud GROUP BY u)
        |SELECT day, CAST(count(*) AS BIGINT) AS n_active,
        |  CAST(sum(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |  CAST(count(*) - sum(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returning
        |FROM ud JOIN fd USING (u) GROUP BY day ORDER BY day""".stripMargin,
    // fixed-point cents before summing; the t chain is the same IEEE op
    // order on both engines (mean diff over sqrt of summed per-group
    // variance quotients) — deterministic, no rounding gate
    "ab_welch" ->
      """WITH v AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'variant' END AS g,
        |    CAST(round(value * 100, 0) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL),
        |st AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c*c) AS BIGINT) AS ss
        |  FROM v GROUP BY g),
        |w AS (
        |  SELECT a.g AS group_a, b.g AS group_b, a.n AS n_a, b.n AS n_b,
        |    a.s AS sa, b.s AS sb, a.ss AS ssa, b.ss AS ssb
        |  FROM st a, st b WHERE a.g < b.g)
        |SELECT group_a, group_b, n_a, n_b,
        |  CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE) AS mean_a,
        |  CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
        |  (CAST(sa AS DOUBLE) / CAST(n_a AS DOUBLE)
        |     - CAST(sb AS DOUBLE) / CAST(n_b AS DOUBLE))
        |  / sqrt(
        |      CAST(n_a*ssa - sa*sa AS DOUBLE) / CAST(n_a*(n_a-1) AS DOUBLE)
        |        / CAST(n_a AS DOUBLE)
        |    + CAST(n_b*ssb - sb*sb AS DOUBLE) / CAST(n_b*(n_b-1) AS DOUBLE)
        |        / CAST(n_b AS DOUBLE)) AS t
        |FROM w""".stripMargin,
    // lift = one IEEE division of exact BIGINT products — no gate
    "basket_lift" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS it
        |  FROM lineitem WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS c FROM bi GROUP BY 1),
        |nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM bi),
        |pairs AS (
        |  SELECT a.it AS item_a, bb.it AS item_b, CAST(count(*) AS BIGINT) AS n_ab
        |  FROM bi a JOIN bi bb ON a.b = bb.b AND a.it < bb.it
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT item_a, item_b, n_ab,
        |  CAST(nb.n * n_ab AS DOUBLE) / CAST(ca.c * cb.c AS DOUBLE) AS lift
        |FROM pairs
        |JOIN ic ca ON ca.it = item_a
        |JOIN ic cb ON cb.it = item_b
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin
  )
}
