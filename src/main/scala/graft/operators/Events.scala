package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators: tumbling-window aggregation and gap-based
  * sessionization (SURVEY §7.6). Batch forms here; the streaming twins live
  * in graft.streaming.EventStreams over the same column expressions.
  */
object Events {

  /** Tumbling time-window counts per key: one shuffle on (window, key),
    * partial aggregation map-side. */
  def tumblingCounts(df: DataFrame, tsCol: String, keyCol: String, unit: String): DataFrame =
    df.groupBy(date_trunc(unit, col(tsCol)).as("win"), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Per-actor inter-arrival statistics: the gap distribution between an
    * actor's consecutive events — the activity-cadence profile behind
    * rate-limit tuning, bot detection (machine-regular gaps), and session
    *-gap threshold selection (pick the sessionize gap from the real p95,
    * not folklore). Returns (keyCol, n_gaps, p50_gap_ms, p95_gap_ms,
    * max_gap_us): gaps are measured in exact integer MICROSECONDS —
    * epoch-second truncation would alias all sub-second cadences (the
    * exact signature bots show) to zero. The quantiles are reported in
    * milliseconds via the exact-integer doctrine, NOT a rounding gate: a
    * linear quantile of integers interpolates at fraction
    * frac(p*(n-1)) = k/20 for p in {0.5, 0.95}, so the true quantile x20
    * is exactly integral. Dividing micros by 1000 then rounding to 4
    * decimals is therefore a built-in TIE: every interpolated value is a
    * multiple of 0.00005 ms — exactly half the 0.0001 rounding step — and
    * the engines' last-ULP interpolation differences decide the round
    * (observed: 2/150 rows flipped at sf0.1). Instead we snap
    * percentile(gap_us)*20 to its integer (interpolation error is ~ULPs,
    * vastly under the 0.5 snap radius at test scale) and perform ONE IEEE
    * division by 20000.0 — a single correctly-rounded op on identical
    * integers, bit-identical across engines with no gate at all.
    * `max_gap_us` needs no interpolation and stays an exact long.
    *
    * Scale shape: one shuffle on the actor key for the lag window
    * (partitions are per-actor event counts, never global), then the
    * rollup rides the same partitioning. Actors with fewer than 2 events
    * have no gaps and drop. Deterministic: the lag orders by (ts, idCol)
    * so same-timestamp events cannot flip order between runs/engines. */
  def interarrivalStats(
      df: DataFrame, tsCol: String, keyCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("__gap",
        unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
      .filter(col("__gap").isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        (round(percentile(col("__gap"), lit(0.5)) * 20).cast("long") / lit(20000.0))
          .as("p50_gap_ms"),
        (round(percentile(col("__gap"), lit(0.95)) * 20).cast("long") / lit(20000.0))
          .as("p95_gap_ms"),
        max(col("__gap")).as("max_gap_us"))
  }

  /** Distinct actors per tumbling window, exact AND sketched — the
    * cardinality counterpart of [[tumblingCounts]]: "how many unique
    * users/sessions per hour" is the metric where exact countDistinct
    * stops scaling first (its expand keeps EVERY distinct key per window
    * in the aggregation state), so the HyperLogLog++ sketch
    * (`approx_count_distinct`, constant state per window, mergeable
    * map-side) is the 100 TB path. Emits the exact count plus a pinned
    * tolerance flag (|approx − exact| ≤ 3·rsd·exact + 3: three standard
    * errors of the sketch, plus an absolute allowance of 3 because the
    * relative guarantee is asymptotic — tiny windows sit in HLL's
    * sparse/linear-counting regime where the estimate quantizes and a
    * 10-actor hour can legitimately read 12), making any sketch
    * regression a driver-visible fail, same differential discipline as
    * the table-level sketch query. At real scale call with
    * `emitApprox = true` to ALSO get the sketch value itself
    * (`approx_actors`) — that column has no SQL mirror, so the
    * oracle-registered query keeps the default. */
  def windowDistinct(
      df: DataFrame, tsCol: String, actorCol: String, unit: String,
      rsd: Double = 0.05, emitApprox: Boolean = false): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    val base = df.groupBy(date_trunc(unit, col(tsCol)).as("win"))
      .agg(
        countDistinct(col(actorCol)).as("n_actors"),
        approx_count_distinct(col(actorCol), rsd).as("__approx"))
      .withColumn("sketch_ok",
        when(abs(col("__approx") - col("n_actors")) <=
          col("n_actors") * (3 * rsd) + 3, 1).otherwise(0))
    if (emitApprox)
      base.select(col("win"), col("n_actors"),
        col("__approx").as("approx_actors"), col("sketch_ok"))
    else base.select(col("win"), col("n_actors"), col("sketch_ok"))
  }

  /** Per-window top-k keys ("trending"): the k most frequent keys inside
    * each tumbling window, rank deterministic (count desc, key asc).
    *
    * Scale shape: one partial-aggregated (window, key) count, then the
    * rank filter is WindowGroupLimit-rewritten — map tasks forward at most
    * k keys per window to the ranking shuffle, so a window with a billion
    * events still ships k rows per task, not its whole key histogram. */
  def trendingKeys(
      df: DataFrame, tsCol: String, keyCol: String, unit: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = tumblingCounts(df, tsCol, keyCol, unit)
    // NULLS LAST on the tie-break: Spark's ascending default is NULLS
    // FIRST while SQL engines (and the oracle) default LAST — a rank tie
    // involving a NULL key would otherwise order differently per engine
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("win")).orderBy(col("n").desc, col(keyCol).asc_nulls_last)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Sliding (hopping) window counts per key: each event lands in every
    * window of `widthMinutes` whose epoch-aligned start (multiple of
    * `slideMinutes`, UTC session tz) lies in (t − width, t] — Spark's
    * `window(ts, width, slide)` semantics, window = [start, start+width).
    *
    * Scale shape: the built-in `window()` expands each row into its
    * ⌈width/slide⌉ overlapping windows (a bounded, constant fan-out Expand
    * — never a self-join or range join), then one partial-aggregated
    * shuffle on (window, key). Same plan family as the streaming
    * windowed-agg twin, so batch and stream sliding counts share
    * semantics. */
  def slidingCounts(
      df: DataFrame, tsCol: String, keyCol: String,
      widthMinutes: Long, slideMinutes: Long): DataFrame = {
    require(widthMinutes > 0 && slideMinutes > 0 && slideMinutes <= widthMinutes,
      s"need 0 < slide <= width, got width=$widthMinutes slide=$slideMinutes")
    df.groupBy(
        window(col(tsCol), s"$widthMinutes minutes", s"$slideMinutes minutes"),
        col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col(keyCol), col("n"))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Session ids are
    * a running sum of session-start flags per user — one shuffle on
    * user_id (the window partition key); ties on ts break by event id so
    * the assignment is deterministic.
    *
    * Gaps are measured at MICROSECOND precision (`unix_micros`, the full
    * resolution of TimestampType) — identical to the streaming twin
    * (EventStreams.sessionize) and to the DuckDB oracle's `epoch_us`
    * comparison. A second-truncated gap would assign events with
    * sub-second components near the boundary to different sessions than
    * the streaming path (parity pinned in StreamingSpec). */
  def sessionize(
      df: DataFrame, userCol: String, tsCol: String, idCol: String,
      gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val gapMicros = gapMinutes * 60L * 1000000L
    val isNew = when(prevTs.isNull, 1L).otherwise(
      when(unix_micros(col(tsCol)) - unix_micros(prevTs) > gapMicros, 1L)
        .otherwise(0L))
    df.withColumn("session_id", sum(isNew).over(byUser))
  }

  /** Session-level rollup: bounds + event count per (user, session). */
  def sessionStats(sessionized: DataFrame, userCol: String, tsCol: String): DataFrame =
    sessionized.groupBy(col(userCol), col("session_id"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))

  /** Session concurrency profile: how many sessions are ACTIVE in each
    * hour — the interval-stabbing question behind capacity planning
    * ("what does peak concurrency look like?") and licensing/connection
    * -pool sizing. A session is active in every hour bucket its
    * [start, end] span touches.
    *
    * Scale shape — the naive interval-overlap self-join is quadratic;
    * this is the standard BUCKETIZATION: each session explodes into the
    * hour buckets it covers (sessions are minutes long, so the fan-out
    * per session is 1–2 buckets; a pathological week-long interval fans
    * out 168×, still linear), then one partial-aggregated groupBy on the
    * bucket. No join at all — the session table is already one row per
    * interval ([[sessionStats]]'s output feeds straight in). Returns
    * (hour, n_active, n_starting) — `n_starting` (sessions whose first
    * event lands in the hour) rides along so load (arrivals) and
    * concurrency (stabbing count) read from one table. */
  def sessionConcurrency(
      sessions: DataFrame, startCol: String, endCol: String): DataFrame = {
    val h0 = date_trunc("hour", col(startCol))
    // inverted-interval guard (same diagnostic family as
    // intervalOverlapJoin): [[sessionStats]] output satisfies end >= start
    // by construction, but on raw/corrupt input Spark's sequence() would
    // die with its obscure "illegal sequence boundaries" instead of naming
    // the offending row
    val h1 = when(col(endCol) < col(startCol), raise_error(concat(
        lit(s"sessionConcurrency: inverted interval ($startCol > $endCol): "),
        col(startCol).cast("string"), lit(" > "), col(endCol).cast("string"),
        lit(" — fix the feed; the hour span of an inverted interval is undefined")))
        .cast("timestamp"))
      .otherwise(date_trunc("hour", col(endCol)))
    sessions
      .select(h0.as("__h0"),
        explode(sequence(h0, h1, expr("INTERVAL 1 HOUR"))).as("hour"))
      .groupBy("hour")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("__h0") === col("hour"), 1L).otherwise(0L)).as("n_starting"))
  }

  /** Ordered-funnel reach with a conversion window: for the step sequence
    * (s₁…sₖ), a user reaches step i when an sᵢ event occurs STRICTLY after
    * their step-(i−1) time and within `windowMinutes` of it; the step time
    * is the EARLIEST such event. Returns one row per step:
    * (step, step_name, n_users).
    *
    * Times compare at microsecond precision (`unix_micros`, matching
    * [[sessionize]] and the DuckDB oracle's `epoch_us`) — fixture events
    * carry sub-second components, so a seconds-truncated window flips
    * users near the boundary.
    *
    * Scale shape: step i is one equi-join on the user key between the
    * (type-filtered, so already pruned at the scan) event table and the
    * previous step's per-user single-row aggregate, followed by a
    * partial-aggregated min — k−1 joins against ever-shrinking sides, no
    * window over full event history, no per-user event collection. The
    * per-step counts are k single-row aggregates unioned into one result —
    * all declarative, nothing collected. */
  def funnelReach(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowMinutes: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMinutes > 0, "windowMinutes must be positive")
    val winMicros = windowMinutes * 60L * 1000000L
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    val reached = steps.tail.scanLeft(first) { (prev, step) =>
      val p = prev.select(col(userCol).as("__u"), col("__t"))
      df.filter(col(typeCol) === step)
        .join(p, col(userCol) === col("__u"))
        .filter(unix_micros(col(tsCol)) > unix_micros(col("__t")) &&
          unix_micros(col(tsCol)) - unix_micros(col("__t")) <= winMicros)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    }
    steps.zip(reached).zipWithIndex.map { case ((name, stepDf), i) =>
      stepDf.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** [[funnelReach]] plus per-step conversion rates: each step's
    * n_users over the previous step's — the number a growth/ops review
    * actually reads (absolute reach needs corpus context; the rate is
    * self-normalizing). Step 1 has no predecessor and reports NULL; a
    * zero-reach predecessor also yields NULL (0/0 is not a rate).
    * The lag window runs over the k-row step summary only — never data. */
  def funnelConversion(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowMinutes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reach = funnelReach(df, userCol, tsCol, typeCol, steps, windowMinutes)
    val w = Window.orderBy(col("step"))
    reach.withColumn("conv_rate", {
      val prev = lag(col("n_users"), 1).over(w)
      when(prev > 0, round(col("n_users").cast("double") / prev, 6))
    })
  }

  /** Per-key rate anomalies: hourly event counts z-scored against the
    * key's own hourly mean/stddev; rows with |z| ≥ `zThreshold` are the
    * monitoring signal every ingest pipeline wants (a traffic spike, a
    * dead source). Hours with NO events are zero-filled first, on a
    * spine running from each key's own first hour to the DATASET's last
    * hour — without the fill, a key that goes silent simply produces no
    * (key, hour) rows and the outage is invisible to the z-score; and
    * the global (not per-key) upper bound is what makes the dead-source
    * case detectable at all, since a dead key's own max(ts) is its last
    * healthy event. The gap hours are genuine n=0 observations that both
    * depress the mean and surface as low-z rows (pinned in ProfileSpec's
    * dead-source test). Keys whose rate never varies (stddev 0 →
    * z NULL) are by definition anomaly-free and drop out.
    *
    * Scale shape: one partial-aggregated groupBy on (key, hour) plus the
    * spine equi-join — output bounded by keys × span-hours — then
    * mean/stddev as ONE window shuffle per key over those compact rows
    * (never over raw events). z is emitted ROUNDED to 4 decimals: Spark
    * and DuckDB both use Welford accumulation for stddev but disagree in
    * final ulps; fixture z values sit well clear of the threshold, so
    * rounding can't flip membership (ProfileSpec pins the margin).
    *
    * `maxSpineHours` bounds the per-key zero-fill fan-out: the spine emits
    * (span ÷ 1 hour) rows PER KEY, so one key whose first event predates
    * the dataset's last hour by decades (a bad-clock record, an epoch-0
    * default) would alone explode the spine — and silently truncating it
    * would change every z-score. Exceeding the bound fails loudly
    * map-side instead (default 5 years of hourly rows per key); raise it
    * deliberately for genuinely longer histories, or pre-filter the
    * out-of-range timestamps. */
  def rateAnomalies(
      df: DataFrame, tsCol: String, keyCol: String,
      zThreshold: Double = 2.0,
      maxSpineHours: Int = 43800): DataFrame = {
    require(zThreshold > 0, "zThreshold must be positive")
    require(maxSpineHours > 0, "maxSpineHours must be positive")
    // spine: per-key first hour -> GLOBAL last hour (1-row agg, broadcast)
    val h1 = df.agg(date_trunc("hour", max(col(tsCol))).as("__h1"))
    val spanHours = expr("timestampdiff(HOUR, __h0, __h1)")
    val guardedH0 = when(spanHours <= maxSpineHours, col("__h0"))
      .otherwise(raise_error(concat(
        lit(s"rateAnomalies: key "), col(keyCol).cast("string"),
        lit(s" spans "), spanHours.cast("string"),
        lit(s" hours, over maxSpineHours=$maxSpineHours — a zero-fill spine " +
          "this long is almost always a corrupt timestamp; pre-filter it or " +
          "raise maxSpineHours"))))
    val spine = df.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("__h0"))
      .crossJoin(broadcast(h1))
      .select(col(keyCol),
        explode(sequence(guardedH0, col("__h1"), expr("interval 1 hour"))).as("hour"))
    val raw = df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val counts = spine.join(raw, Seq(keyCol, "hour"), "left")
      .na.fill(0L, Seq("n"))
    val byKey = Window.partitionBy(keyCol)
    val sd = stddev_samp(col("n")).over(byKey)
    // explicit zero-variance guard: ANSI mode (Spark 4 default) turns the
    // 0/0 of a constant-rate key into a runtime error rather than NULL
    val z = when(sd > 0, (col("n") - avg(col("n")).over(byKey)) / sd)
    counts.withColumn("z", round(z, 4))
      .filter(abs(col("z")) >= zThreshold)
  }

  /** Cohort retention matrix: each user belongs to the cohort of their
    * FIRST active period (day/hour truncation), and the matrix counts how
    * many of each cohort's users were active again N periods later — the
    * standard growth/retention analysis; for a training-data pipeline,
    * the freshness profile of a source (how long a crawl cohort keeps
    * contributing new activity).
    *
    * Scale shape: first-seen is one partial-aggregated user-key shuffle;
    * active periods are one (user, period) DISTINCT — the count of
    * retained users never materializes per-cohort sets, because after the
    * distinct each user contributes exactly one row per active period and
    * cohort is functionally determined by user, so a plain count IS the
    * distinct-user count. The user-key equi-join joins two aggregates of
    * the same relation; the final rollup is one partial agg bounded by
    * cohorts × offsets. No windows over raw history, nothing collected. */
  def cohortRetention(
      df: DataFrame, userCol: String, tsCol: String,
      period: String = "day"): DataFrame = {
    require(Set("day", "hour")(period), s"period must be day|hour: $period")
    val first = df.groupBy(col(userCol))
      .agg(date_trunc(period, min(col(tsCol))).as("cohort"))
    val active = df.select(col(userCol), date_trunc(period, col(tsCol)).as("__p"))
      .distinct()
    val offset = (period match {
      case "day" => datediff(col("__p"), col("cohort"))
      case "hour" =>
        ((unix_micros(col("__p")) - unix_micros(col("cohort"))) / 3600000000L)
          .cast("int")
    }).as("period_offset")
    active.join(first, userCol)
      .groupBy(col("cohort"), offset)
      .agg(count(lit(1)).as("n_users"))
  }

  /** Hourly resample with gap filling: per key, one row for EVERY hour
    * between that key's first and last event — empty hours appear with
    * n = 0 (the time-series densification every downstream rate/trend
    * computation needs; a plain groupBy silently skips them).
    *
    * Scale shape: the hour spine is generated DISTRIBUTED via
    * sequence+explode from each key's (min, max) aggregate — no driver
    * loop, no calendar table collect; output volume is bounded by
    * keys × span-hours. The spine-to-counts join is an equi-join on
    * (key, hour) between two aggregates of the same relation, so both
    * sides arrive hash-partitioned compatibly. */
  def resampleHourly(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spine = df.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("__h0"),
        date_trunc("hour", max(col(tsCol))).as("__h1"))
      .select(col(keyCol),
        explode(sequence(col("__h0"), col("__h1"), expr("interval 1 hour"))).as("hour"))
    val counts = df.groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    spine.join(counts, Seq(keyCol, "hour"), "left")
      .na.fill(0L, Seq("n"))
  }

  /** First-order Markov transition matrix over per-actor event sequences:
    * for each (event_type → next event_type) pair, the transition count
    * and conditional probability P(next | current) — the behavioral model
    * behind funnel design (which steps actually follow which), anomaly
    * scoring (improbable transitions), and synthetic-traffic generation.
    *
    * Successor pairs come from `lead` over (key, ts, idCol) — the same
    * deterministic tie-break contract as [[interarrivalStats]]: two
    * same-timestamp events order by id, so the pair set cannot flip
    * between runs or engines. Each actor's LAST event has no successor
    * and contributes no pair (no artificial terminal state — callers
    * wanting absorbing-state semantics can append a sentinel event).
    *
    * Scale shape: one shuffle on the actor key for the lead window
    * (per-actor partitions, never global), then one partial-aggregated
    * groupBy on the (from, to) pair — output is bounded by
    * |event types|², tiny. The probability denominator is a window-sum
    * over those same aggregate rows, not a rescan. */
  def transitionMatrix(
      df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val pairs = df
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val perFrom = Window.partitionBy(col("from_type"))
      .rowsBetween(Long.MinValue, Long.MaxValue)
    pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(perFrom), 6))
  }

  /** Rolling active-user rollup: per calendar day, the distinct actors
    * seen that day (DAU), in the trailing 7 days (WAU), in the trailing
    * 30 days (MAU), and the DAU/MAU stickiness ratio — the product-health
    * dashboard row. Windows are inclusive trailing ranges ending at the
    * day itself, reported for every day the data contains (early days'
    * WAU/MAU cover the data available, the standard convention).
    *
    * Scale shape: the corpus collapses FIRST to the distinct (day, actor)
    * table — one dedup shuffle, |active days × daily actors| rows, the
    * only pass over raw events. The day spine (≤ a few thousand rows,
    * broadcast) then range-joins that compact table once per window
    * width; count(DISTINCT) runs over |spine × window-days × daily
    * actors| rows, bounded and far below corpus scale. At very long
    * retentions, swap the distinct count for a per-day HLL sketch merge
    * — the exact form here IS the oracle baseline. Stickiness is one
    * division of the two exact counts (bit-identical cross-engine, no
    * gate — the [[burstiness]] doctrine). */
  def activeUsers(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.select(date_trunc("day", col(tsCol)).as("day"),
      col(keyCol).as("__u")).distinct()
    val spine = daily.select(col("day")).distinct()
    // ONE 30-day range join computes all three windows: the 30-day pair
    // set is a superset of the 7-day and same-day pairs, so DAU/WAU fall
    // out as conditional distinct counts over the same joined rows — the
    // nested-loop range join (the dominant cost) runs once instead of
    // twice, and the DAU aggregate + two stitch joins disappear. The
    // three countDistincts expand the joined rows 3× before aggregation,
    // far cheaper than a second |daily × spine| loop.
    broadcast(spine.withColumnRenamed("day", "__d"))
      .join(daily,
        col("day") > col("__d") - expr("INTERVAL 30 DAYS") &&
          col("day") <= col("__d"))
      .groupBy(col("__d"))
      .agg(
        countDistinct(when(col("day") === col("__d"), col("__u"))).as("dau"),
        countDistinct(when(col("day") > col("__d") - expr("INTERVAL 7 DAYS"),
          col("__u"))).as("wau"),
        countDistinct(col("__u")).as("mau"))
      .withColumnRenamed("__d", "day")
      .withColumn("stickiness", col("dau").cast("double") / col("mau"))
  }

  /** Conversion lag: per actor, the FIRST `fromType` event and the first
    * `toType` event AT OR AFTER it, with the exact integer-microsecond
    * lag between them — the time-to-convert base table behind funnel
    * latency quantiles and "did the new flow shorten signup→purchase?"
    * comparisons. Actors who never converted after their first
    * `fromType` are EXCLUDED (this is the converted-cohort table; the
    * unconverted count is `funnelReach`'s job — quantiles over a table
    * that right-censors silently would understate real latency, so the
    * censoring is explicit in the contract).
    *
    * Lag stays an exact LONG in microseconds ([[interarrivalStats]]'s
    * doctrine: no division, no rounding, nothing for two engines to
    * disagree on); callers wanting human units divide once downstream.
    *
    * Scale shape: two filtered per-actor aggregates (partial map-side),
    * one equi-join on the actor key between them — the conversion filter
    * `ts >= first_from` rides the join, and raw history is scanned once
    * per event type, never windowed. */
  def conversionLag(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      fromType: String, toType: String): DataFrame = {
    val firstFrom = df.filter(col(typeCol) === fromType)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("first_from"))
    df.filter(col(typeCol) === toType)
      .join(firstFrom, keyCol)
      .filter(col(tsCol) >= col("first_from"))
      .groupBy(col(keyCol), col("first_from"))
      .agg(min(col(tsCol)).as("first_to"))
      .withColumn("lag_us",
        unix_micros(col("first_to")) - unix_micros(col("first_from")))
  }

  /** Sketch-path [[activeUsers]]: per-day HLL user sketches (Datasketches
    * via `hll_sketch_agg`), trailing WAU/MAU from UNIONS of the daily
    * sketches — the long-retention 100 TB shape the exact operator's
    * docstring names. The exact path re-touches the (day, actor) table
    * for every window; here each day collapses once into a ~KB sketch
    * and any trailing window is a union of ≤30 sketches — years of
    * retention stay a few MB, and the range join runs over |days| sketch
    * rows, not |days × daily actors|.
    *
    * Returns per day: exact dau (a per-day count is cheap either way),
    * exact wau/mau (the verification baseline — drop them in production
    * for the pure sketch path) plus `wau_est`/`mau_est` and `wau_ok`/
    * `mau_ok` flags pinning |est − exact| ≤ `tol`·exact. HLL estimates
    * are deterministic for a given input set (hash-based, no RNG), so
    * the flags are stable across runs/partitionings; lgConfigK 12 gives
    * ~1.6% standard relative error against the default 5% tolerance. */
  def activeUsersSketch(
      df: DataFrame, keyCol: String, tsCol: String,
      lgConfigK: Int = 12, tol: Double = 0.05): DataFrame = {
    val daily = df.groupBy(date_trunc("day", col(tsCol)).as("day"))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("__sk"))
    val spine = daily.select(col("day"))
    val est = broadcast(spine.withColumnRenamed("day", "__d"))
      .join(daily,
        col("day") > col("__d") - expr("INTERVAL 30 DAYS") &&
          col("day") <= col("__d"))
      .groupBy(col("__d").as("day"))
      .agg(
        hll_sketch_estimate(hll_union_agg(
          when(col("day") > col("__d") - expr("INTERVAL 7 DAYS"), col("__sk"))))
          .as("wau_est"),
        hll_sketch_estimate(hll_union_agg(col("__sk"))).as("mau_est"))
    def ok(estC: Column, exact: Column) =
      when(abs(estC.cast("double") - exact) <= lit(tol) * exact, 1).otherwise(0)
    activeUsers(df, keyCol, tsCol).drop("stickiness")
      .join(est, "day")
      .withColumn("wau_ok", ok(col("wau_est"), col("wau")))
      .withColumn("mau_ok", ok(col("mau_est"), col("mau")))
      .select("day", "dau", "wau", "mau", "wau_ok", "mau_ok")
  }

  /** Seasonality profile: event counts by (day-of-week × hour-of-day)
    * cell with each cell's share of total traffic — the weekly heatmap
    * behind capacity planning, anomaly-baseline selection ("is Tuesday
    * 3am traffic supposed to be zero?"), and bot smell (human traffic has
    * a diurnal shape; machine traffic is flat). `dow` follows Spark's
    * dayofweek: 1 = Sunday … 7 = Saturday.
    *
    * Scale shape: one partial-aggregated groupBy on the ≤168-cell key;
    * the share divides over a window on those same aggregate rows. */
  def seasonalityProfile(df: DataFrame, tsCol: String): DataFrame = {
    val all = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    df.groupBy(dayofweek(col(tsCol)).as("dow"), hour(col(tsCol)).as("hod"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / sum(col("n")).over(all), 6))
  }

  /** New-vs-returning split per day — the growth dashboard's first chart:
    * a user is NEW on their first-ever active day, RETURNING on every
    * later one. Returns (day, n_active, n_new, n_returning) with
    * n_active = distinct users that day and n_new + n_returning =
    * n_active. NULL users/timestamps drop (no identity / no day).
    *
    * Scale shape: (user, day) distinct pairs, one groupBy per user for
    * the first day (partial-aggregated min), one groupBy per day — the
    * first-day flag joins back on the user key the pairs already carry.
    * All exact integers. */
  def userGrowth(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ud = df.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).cast("date").as("day"))
      .distinct()
    val firstDay = ud.groupBy("u").agg(min(col("day")).as("__first"))
    ud.join(firstDay, Seq("u"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("__first"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
  }

  /** Per-actor burstiness (index of dispersion): the Fano factor
    * var/mean of the actor's per-period event counts — ~1 for Poisson
    * (human-ish) arrivals, ≫1 for bursty actors (batch jobs, scrapers
    * waking hourly), ~0 for metronomic bots. Returns one row per actor:
    * (key, n_periods, mean_n, var_n, fano).
    *
    * Computed over the actor's ACTIVE periods only (periods where the
    * actor has ≥1 event) — the deliberate simplification: including an
    * actor's silent periods needs the global period spine crossed with
    * every actor ([[resampleHourly]]'s shape, |actors|×|periods| rows),
    * which at 100 TB manufactures a table far larger than the input to
    * mostly hold zeros. Active-period Fano UNDERSTATES burstiness for
    * mostly-silent actors; callers comparing against a Poisson null
    * should condition on activity or feed a resampled spine through the
    * same rollup. Single-period actors report NULL var/fano (undefined),
    * not 0 (metronome) — the two must not alias.
    *
    * Scale shape: one partial-aggregated groupBy on (actor, period),
    * then one on actor over those rollup rows; no window, no spine.
    *
    * Numeric contract — every statistic is ONE IEEE division of exact
    * integer aggregates (mean = Σx/n, var = (n·Σx² − (Σx)²)/n²,
    * fano = (n·Σx² − (Σx)²)/(n·Σx)), NOT a rounded-then-divided chain:
    * these ratios of small-denominator integers land EXACTLY on decimal
    * half-grid points (measured: fano 1.5264/2.56 = 0.59625 at sf0.1),
    * where a 4-decimal rounding gate is cross-engine UNSTABLE (Spark
    * rounds the shortest decimal repr half-up; DuckDB rounds the binary
    * value) — while a single correctly-rounded division of the same
    * integers is bit-identical in every IEEE engine, no gate needed. */
  def burstiness(
      df: DataFrame, keyCol: String, tsCol: String, unit: String): DataFrame = {
    val per = df.groupBy(col(keyCol), date_trunc(unit, col(tsCol)).as("__p"))
      .agg(count(lit(1)).as("__n"))
    val n = col("n_periods")
    val m2 = n * col("__sq") - col("__s") * col("__s") // n·Σx² − (Σx)²  (exact)
    per.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_periods"),
        sum(col("__n")).as("__s"),
        sum(col("__n") * col("__n")).as("__sq"))
      .withColumn("mean_n", col("__s").cast("double") / n)
      .withColumn("var_n",
        when(n > 1, m2.cast("double") / (n * n)))
      .withColumn("fano",
        when(n > 1 && col("__s") > 0, m2.cast("double") / (n * col("__s"))))
      .drop("__s", "__sq")
  }

  /** Path signatures: each actor's first `depth` event types joined with
    * '>' — the entry-path distribution behind onboarding analysis ("what
    * do users actually do first?") and bot fingerprinting (machine
    * traffic concentrates on a handful of exact paths). Returns
    * (path, n_actors) per distinct prefix path; actors with fewer than
    * `depth` events contribute their full shorter path (dropping them
    * would silently remove the bounce cohort — the most interesting one).
    *
    * Ordering is the family's deterministic (ts, idCol) tie-break. Scale
    * shape: one shuffle on the actor key for the rank window —
    * WindowGroupLimit forwards at most `depth` rows per actor map-side —
    * then the path assembles per-actor via sorted collect_list (bounded
    * at `depth` elements) and one partial-aggregated groupBy counts
    * paths; output is |distinct paths| rows, bounded by
    * |event types|^depth. */
  def pathSignatures(
      df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, idCol: String, depth: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.select(col(keyCol), col(typeCol), col(tsCol), col(idCol),
        row_number().over(w).as("__rn"))
      .filter(col("__rn") <= depth)
      .groupBy(col(keyCol))
      // sort_array on (rank, type) structs reassembles event order inside
      // the group without re-windowing; collect_list is unordered by
      // contract, so the rank must ride along
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("__rn"), col(typeCol)))),
        s => s.getField(typeCol)), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_actors"))
  }

  /** CUSUM changepoint scan over per-period event counts: cumulative sum
    * of (count − global mean) ordered by period — the standard
    * level-shift detector (a regime change shows as a V or Λ in the
    * cusum; the extremum is the most likely changepoint). Run it on a
    * day/hour rollup before trusting a before/after comparison window.
    *
    * Returns one row per period: (period, n, cusum, is_peak) where
    * `is_peak` marks the period(s) achieving the maximum |cusum| — ties
    * all flag, the caller picks. Scale shape: the corpus collapses to a
    * per-period partial-aggregated groupBy FIRST; the mean, the ordered
    * cumulative sum, and the peak scan are windows over that tiny
    * aggregate (|periods| rows), so the raw history is scanned once and
    * never sorted. `cusum` rounds to 4 after subtraction — the oracle
    * mirrors the operation order. */
  def cusumChangepoint(df: DataFrame, tsCol: String, unit: String): DataFrame = {
    val perPeriod = df.groupBy(date_trunc(unit, col(tsCol)).as("period"))
      .agg(count(lit(1)).as("n"))
    val all = Window.rowsBetween(Long.MinValue, Long.MaxValue)
    val cum = Window.orderBy("period").rowsBetween(Long.MinValue, 0)
    perPeriod
      // the mean materializes in its own projection first: Spark rejects a
      // window expression nested inside another window's aggregate
      .withColumn("__mean", avg(col("n")).over(all))
      // + 0.0 normalizes IEEE negative zero: the closing cusum is a ~1e-13
      // FP residue whose SIGN depends on accumulation details, and
      // round(-1e-13, 4) = -0.0 while round(+1e-13, 4) = 0.0 — two engines
      // can disagree on the sign and -0.0 vs 0.0 breaks value-sorted
      // comparison; (-0.0) + 0.0 = +0.0 in both
      .withColumn("cusum", round(
        sum(col("n").cast("double") - col("__mean")).over(cum), 4) + lit(0.0))
      .drop("__mean")
      .withColumn("is_peak",
        when(abs(col("cusum")) === max(abs(col("cusum"))).over(all), 1)
          .otherwise(0))
  }

  /** Autocorrelation of the hourly event-count series at the given lags —
    * the periodicity detector: r(24) ≈ 1 says daily rhythm, r(168) weekly,
    * all ≈ 0 says the feed is arrival-time uniform (no seasonality to
    * model, [[seasonalityProfile]] cells would be flat). Computed over the
    * DENSE hour spine (silent hours count 0 — skipping them would
    * manufacture correlation from activity gaps alone, the
    * [[resampleHourly]] rationale). Returns (lag, n_pairs, r) with
    * n_pairs = |hours| − lag; lags beyond the span yield no pairs and drop.
    *
    * Scale shape: one partial-aggregated groupBy to hourly counts
    * (|hours| rows — bounded by the time span, not the event count), a
    * map-side hour index from the broadcast 1-row bounds (no window, no
    * global sort), one equi-join of the tiny spine with itself on
    * (i + lag = i'), and a per-lag rollup.
    *
    * Numeric contract — house exact-integer doctrine: all seven per-lag
    * aggregates are exact BIGINTs; r is computed as
    * (n·Σxy − Σx·Σy) / (√(n·Σx² − (Σx)²) · √(n·Σy² − (Σy)²)) — two
    * correctly-rounded square roots of exact integers, one multiply, one
    * division, all IEEE-deterministic from identical inputs, so the
    * result is bit-identical cross-engine with NO rounding gate. The
    * denominator factors stay separate (their exact product can exceed
    * 2^53 and would round BEFORE the sqrt). Zero-variance sides report
    * NULL (undefined, not 0). */
  /** Conversion attribution under the two standard position models: for
    * every conversion event, the user's FIRST and LAST non-conversion
    * event type before it (strictly earlier in (ts, id) order) credit
    * their channel. Returns long-form (model, channel, n) with
    * model ∈ {first_touch, last_touch}; conversions with no prior
    * touchpoint land in the NULL channel — a count the report must show
    * (dropping it silently overstates every real channel's share).
    *
    * Scale shape: ONE window pass partitioned by user (running first/last
    * with ignoreNulls over the preceding frame — no self-join of the
    * event table against itself, which is the naive attribution query),
    * then two partial-aggregated groupBys over the conversions only.
    * Multi-touch models (linear, time-decay) would ride the same
    * window pass with a collected-paths column instead. */
  def attributionCounts(
      df: DataFrame, userCol: String, tsCol: String, typeCol: String,
      idCol: String, conversion: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(userCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Long.MinValue, -1)
    val touch = when(col(typeCol) =!= conversion, col(typeCol))
    val scored = df
      .withColumn("__first", first(touch, ignoreNulls = true).over(w))
      .withColumn("__last", last(touch, ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversion)
    scored.groupBy(col("__first").as("channel"))
      .agg(count(lit(1)).as("n"))
      .select(lit("first_touch").as("model"), col("channel"), col("n"))
      .unionByName(
        scored.groupBy(col("__last").as("channel"))
          .agg(count(lit(1)).as("n"))
          .select(lit("last_touch").as("model"), col("channel"), col("n")))
  }

  /** The DENSE hourly count series (hr, i, n): every hour between the
    * min and max event hour appears, silent hours with n = 0, `i` the
    * 0-based hour index from the broadcast bounds (map-side — no window,
    * no global sort). Shared by [[autocorrLag]] and [[trendDecompose]] so
    * the two cannot disagree on what "the series" is. |hours| rows —
    * bounded by the time span, never the event count. */
  def hourlySeries(df: DataFrame, tsCol: String): DataFrame = {
    val ev = df.filter(col(tsCol).isNotNull)
    val bounds = ev.agg(
      date_trunc("hour", min(col(tsCol))).as("h0"),
      date_trunc("hour", max(col(tsCol))).as("h1"))
    val counts = ev
      .groupBy(date_trunc("hour", col(tsCol)).as("hr"))
      .agg(count(lit(1)).as("n"))
    bounds
      .select(col("h0"), explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("hr"))
      .join(counts, Seq("hr"), "left")
      .select(col("hr"),
        ((unix_timestamp(col("hr")) - unix_timestamp(col("h0"))) / 3600L)
          .cast("long").as("i"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Moving-average trend decomposition of the hourly count series:
    * trend = mean count over the centered ±`halfWindow` hours, residual
    * = count − trend — the detrend step before eyeballing anomalies or
    * feeding a changepoint detector (a level shift inflates raw-count
    * z-scores everywhere; residuals isolate the local deviation).
    * Returns (hr, n, trend, resid); edge hours average over their
    * truncated window (standard one-sided behavior, no NULL padding).
    *
    * The trend window runs over the SPINE (|hours| rows, calendar-
    * bounded), so its single-partition window is deliberate and cheap —
    * the corpus itself is reduced by [[hourlySeries]] first. Numeric
    * contract: trend is ONE division of exact BIGINT window sums
    * (explicit sum/count, never a sliding `avg` whose incremental
    * accumulator rounds differently across engines); resid is one
    * further IEEE subtraction. No gate. */
  def trendDecompose(
      df: DataFrame, tsCol: String, halfWindow: Int = 12): DataFrame = {
    require(halfWindow >= 1, s"halfWindow must be >= 1, got $halfWindow")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("i").rowsBetween(-halfWindow, halfWindow)
    hourlySeries(df, tsCol)
      .withColumn("trend",
        sum(col("n")).over(w).cast("double") /
          count(col("n")).over(w).cast("double"))
      .withColumn("resid", col("n").cast("double") - col("trend"))
      .select("hr", "n", "trend", "resid")
  }

  def autocorrLag(
      df: DataFrame, tsCol: String, lags: Seq[Int] = Seq(1, 24, 168)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1),
      s"lags must be positive, got $lags")
    require(lags.distinct.size == lags.size,
      s"duplicate lags double-count pairs through the cross join, got $lags")
    val s = hourlySeries(df, tsCol).select("i", "n")
    val lagTab = broadcast(
      df.sparkSession.createDataFrame(lags.map(Tuple1(_))).toDF("lag"))
    val a = s.crossJoin(lagTab)
      .select(col("lag"), col("i"), col("n").as("x"))
    val pairs = a.join(
      s.select(col("i").as("__j"), col("n").as("y")),
      col("__j") === col("i") + col("lag"))
    val g = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val d1 = g("n_pairs") * g("sxx") - g("sx") * g("sx")
    val d2 = g("n_pairs") * g("syy") - g("sy") * g("sy")
    g.select(col("lag"), col("n_pairs"),
      when(d1 > 0 && d2 > 0,
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(d1.cast("double")) * sqrt(d2.cast("double")))).as("r"))
  }
}
