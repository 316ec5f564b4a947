package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators (SURVEY §2.7:
  * the reference is batch-only; this is the engine's streaming surface for
  * the same semantics, built on watermarks + windowed aggregation and
  * mapGroupsWithState — no custom sinks/sources).
  *
  * Works on any streaming DataFrame with (event_id long, ts timestamp,
  * user_id long, event_type string) — e.g. readStream over the events table
  * layout, or a MemoryStream in tests.
  */
object EventStreams {

  /** Tumbling windowed counts with a watermark: late rows beyond
    * `lateness` are dropped, state is bounded (the window is eligible for
    * eviction once the watermark passes). Append-mode friendly. */
  def tumblingCounts(
      stream: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win"), col("event_type"), col("n"))

  /** Sliding windowed counts with a watermark — the streaming twin of
    * [[graft.operators.Events.slidingCounts]]: the same built-in
    * `window()` expansion (each event lands in ⌈width/slide⌉ overlapping
    * epoch-aligned windows) over the state store, with the watermark
    * bounding state to the still-open windows. Batch/stream parity is
    * pinned in StreamingSpec. */
  def slidingCounts(
      stream: DataFrame, width: String, slide: String,
      lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
        col("event_type"), col("n"))

  /** Tumbling distinct-actor cardinality via the HLL sketch — the
    * streaming twin of [[graft.operators.Events.windowDistinct]]'s
    * at-scale path. Exact streaming countDistinct would keep every
    * distinct key per open window in the state store (state grows with
    * cardinality); the sketch keeps CONSTANT state per window and its
    * register-max merge is associative, commutative, and idempotent-ish
    * in the ways micro-batch accumulation needs — so the streaming
    * estimate is bit-identical to the batch estimate over the same rows
    * (pinned in StreamingSpec), regardless of how the batches were cut.
    * Watermark bounds open-window state; append-mode friendly. */
  def tumblingDistinctApprox(
      stream: DataFrame, actorCol: String, windowLen: String = "1 hour",
      lateness: String = "10 minutes", rsd: Double = 0.05): DataFrame = {
    require(rsd > 0 && rsd < 1, s"rsd must be in (0,1), got $rsd")
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen))
      .agg(approx_count_distinct(col(actorCol), rsd).as("approx_actors"))
      .select(col("window.start").as("win"), col("approx_actors"))
  }

  /** Production streaming source: tail a directory of event parquet files
    * (the schema events.parquet uses after loadEvents' ts conversion).
    * Files dropped into `dir` become micro-batches; combine with
    * [[tumblingCounts]]/[[sessionize]]/[[dedupEvents]] and a sink. */
  def fromParquetDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 8)
      .parquet(dir)

  /** Streaming exactly-once-per-id dedup with bounded state: duplicate
    * event ids arriving within the watermark window are dropped; state for
    * ids older than the watermark is evicted (unbounded plain
    * dropDuplicates would leak state forever on an infinite stream). */
  def dedupEvents(stream: DataFrame, lateness: String = "1 hour"): DataFrame =
    stream.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: pair each left event with right events
    * of the same user within `(l.ts, l.ts + window]` — the streaming twin
    * of operators.Temporal.rangeJoin. Watermarks on BOTH sides bound the
    * join state: Spark can discard buffered rows once the other side's
    * watermark passes the interval, so state stays proportional to
    * `rate x (window + lateness)`, not the stream's history. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      windowExpr: String = "INTERVAL 5 MINUTES",
      lateness: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col("event_id").as("l_id"), col("user_id").as("l_user"), col("ts").as("l_ts"))
    val r = right.withWatermark("ts", lateness)
      .select(col("event_id").as("r_id"), col("user_id").as("r_user"), col("ts").as("r_ts"))
    l.join(r,
      col("l_user") === col("r_user") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(windowExpr))
      .select("l_id", "r_id", "l_ts", "r_ts")
  }

  /** Session-level rollup on Spark's NATIVE session windows
    * (`session_window`): the state store merges overlapping per-event
    * windows, the watermark closes and evicts sessions whose gap has
    * passed — bounded state with no custom mapGroupsWithState code. The
    * batch twin is Events.sessionize + sessionStats.
    *
    * Semantics note: an event at EXACTLY gap after its predecessor starts
    * a new session here (half-open window [ts, ts+gap)) but continues the
    * session in the batch twin (`gap > threshold`); the divergence is a
    * measure-zero boundary (parity on the fixture pinned in
    * StreamingSpec). */
  def sessionWindowStats(
      stream: DataFrame, gap: String = "30 minutes",
      lateness: String = "10 minutes"): DataFrame =
    stream
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

  case class Evt(event_id: Long, ts: Timestamp, user_id: Long, event_type: String)
  case class SessionState(sessionId: Long, lastTs: Long)
  case class SessionizedEvt(event_id: Long, user_id: Long, session_id: Long)
  case class GapState(lastTs: Long)
  case class BurstEvt(event_id: Long, user_id: Long, gap_us: Long)
  case class ConvState(firstFromMicros: Long, converted: Boolean)
  case class ConvEvt(user_id: Long, lag_us: Long)

  /** Stateful gap sessionization: per-user state carries (current session
    * id, last event time); a gap above `gapMinutes` starts a new session.
    * Batch twin: graft.operators.Events.sessionize — both measure the gap
    * at MICROSECOND precision (full TimestampType resolution; batch/stream
    * parity on sub-second boundaries pinned in StreamingSpec).
    *
    * `expireState = true` adds a processing-time timeout that evicts
    * abandoned users' state — turn it on for long-running production
    * queries. Note the timeout makes Spark trigger continuous empty
    * micro-batches to process expirations, so `processAllAvailable` (used
    * by tests) never settles with it on.
    *
    * EXPIRY CAVEAT: evicting a user's state also forgets their session
    * counter, so a user who returns after eviction restarts at
    * session_id 1 — ids are unique per (user, state lifetime), not
    * globally (a tombstone would preserve the counter but is the same
    * size as the state itself, defeating the eviction). Downstream logic
    * needing globally unique session keys should key on the session's
    * START TIME instead — [[sessionWindowStats]]'s (user_id,
    * session_start) is stable across watermark-based eviction and is the
    * production path for that case. */
  def sessionize(
      events: Dataset[Evt], gapMinutes: Int = 30,
      expireState: Boolean = false): Dataset[SessionizedEvt] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expireState) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(
      (user: Long, it: Iterator[Evt], state: GroupState[SessionState]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // microsecond epoch (Timestamp.getTime is ms-truncated; nanos
          // carries the rest) — must match the batch twin's unix_micros
          def micros(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue))
          val out = it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).map { e =>
            val gap = micros(e.ts) - s.lastTs
            val sid = if (s.lastTs == Long.MinValue || gap > gapMinutes * 60000000L)
              s.sessionId + 1 else s.sessionId
            // lastTs never moves BACKWARDS: a cross-batch late event (ts <
            // lastTs, negative gap) joins the current session but must not
            // rewind its tail — a rewound tail makes the next IN-ORDER
            // event measure a bogus giant gap and falsely split the
            // session. (Within a batch the sort already orders events;
            // this guards the across-batch arrival order.)
            s = SessionState(sid, math.max(s.lastTs, micros(e.ts)))
            SessionizedEvt(e.event_id, user, sid)
          }
          state.update(s)
          if (expireState) state.setTimeoutDuration(s"${gapMinutes * 4} minutes")
          out.iterator
        }
      })
  }

  /** Burst detector: emit every event arriving within `maxGapMillis` of
    * its actor's previous event — the machine-cadence signal
    * ([[graft.operators.Events.interarrivalStats]] profiles the
    * distribution offline; this flags the sub-threshold gaps LIVE, the
    * bot/abuse shape where a human-impossible cadence should page
    * someone before the batch job runs). Emits (event_id, user_id,
    * gap_us).
    *
    * State per actor is ONE timestamp (constant, vs the session op's
    * per-session id+tail); `expireState` evicts idle actors on the same
    * processing-time-timeout contract as [[sessionize]]. Within a batch,
    * events sort by (ts, id); across batches the last-seen timestamp
    * never rewinds, and a late arrival (event time BEHIND the actor's
    * last-seen) is DROPPED, not measured: its event-time gap is negative
    * and meaningless, and the record carries no arrival time to meter
    * instead — a source that reorders across micro-batches should stamp
    * an arrival-time column and detect on that. The first event of an
    * actor has no gap and never emits. */
  def burstEvents(
      events: Dataset[Evt], maxGapMillis: Long,
      expireState: Boolean = false): Dataset[BurstEvt] = {
    require(maxGapMillis > 0, s"maxGapMillis must be positive, got $maxGapMillis")
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expireState) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(
      (user: Long, it: Iterator[Evt], state: GroupState[GapState]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          def micros(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          var last = state.getOption.map(_.lastTs).getOrElse(Long.MinValue)
          val out = it.toSeq.sortBy(e => (micros(e.ts), e.event_id)).flatMap { e =>
            val m = micros(e.ts)
            val gap = m - last
            val hit = last != Long.MinValue && gap >= 0 && gap <= maxGapMillis * 1000L
            last = math.max(last, m)
            if (hit) Some(BurstEvt(e.event_id, user, gap)) else None
          }
          state.update(GapState(last))
          // timeout must dominate the gap being measured (same rationale
          // as sessionize's gap*4): a fixed 1h eviction with a larger
          // maxGap would expire state mid-gap and silently never measure
          // gaps in (timeout, maxGap] — the actor's next event would look
          // like a first event. Floor of 1h keeps slow-trickle sources
          // from evicting between every event at small maxGaps.
          if (expireState) state.setTimeoutDuration(
            math.max(3600000L, maxGapMillis * 4))
          out.iterator
        }
      })
  }

  /** Streaming conversion tracker: emit (user, lag_us) the moment a
    * `toType` event arrives at-or-after the user's FIRST `fromType`
    * event — the live funnel-latency feed whose batch reconciliation is
    * [[graft.operators.Events.conversionLag]]. One emission per user
    * (first conversion only), lag in exact integer microseconds (the
    * family doctrine). A `toType` arriving before any `fromType` is not
    * a conversion and does not emit.
    *
    * Ordering contract: events are sorted (ts, id) WITHIN each
    * micro-batch; across batches the tracker is exact under in-order
    * per-user delivery (the Kafka-partitioned-by-key norm). A LATE
    * `fromType` arriving after a batch boundary that predates the
    * recorded first-from cannot retroactively lower it — the stream is
    * the low-latency signal, the batch operator the truth at rest; run
    * both, reconcile on the batch cadence (same split as
    * dedup_minhash_incr vs the batch dedup).
    *
    * State per user: (first-from micros, converted flag) — two longs,
    * dropped at `expireState` timeout for abandoned funnels (same
    * processing-time contract as [[burstEvents]]; the timeout bounds
    * state for users who never convert). */
  def conversionEvents(
      events: Dataset[Evt], fromType: String, toType: String,
      expireState: Boolean = false): Dataset[ConvEvt] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (expireState) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeoutConf)(
      (user: Long, it: Iterator[Evt], state: GroupState[ConvState]) => {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          def micros(t: Timestamp): Long =
            t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
          val prior = state.getOption
          var st = prior.getOrElse(ConvState(Long.MinValue, converted = false))
          val batch = it.toSeq
          // first-from SETTLES BEFORE the to-scan: a toType sharing the
          // first fromType's timestamp qualifies in the batch operator
          // (at-or-after) regardless of event-id order, and a single
          // fold would discard it when the sort put it first — the
          // within-batch divergence a reconciliation contract can't have
          if (st.firstFromMicros == Long.MinValue) {
            val froms = batch.filter(_.event_type == fromType)
            if (froms.nonEmpty)
              st = st.copy(firstFromMicros = froms.map(e => micros(e.ts)).min)
          }
          val out =
            if (st.converted || st.firstFromMicros == Long.MinValue) Nil
            else batch.filter(e => e.event_type == toType &&
                micros(e.ts) >= st.firstFromMicros)
              .sortBy(e => (micros(e.ts), e.event_id)).headOption.map { e =>
                st = st.copy(converted = true)
                ConvEvt(user, micros(e.ts) - st.firstFromMicros)
              }.toSeq
          // only funnel PARTICIPANTS hold state: a user who never emits
          // fromType would otherwise pin a sentinel row in the state
          // store forever (unbounded growth on high-cardinality streams
          // where most users never enter the funnel)
          if (st != ConvState(Long.MinValue, converted = false)) {
            state.update(st)
            if (expireState) state.setTimeoutDuration("24 hours")
          }
          out.iterator
        }
      })
  }

  /** Continuous drift monitor: per micro-batch, score the batch's
    * `valueCol` distribution against a STATIC reference snapshot with the
    * SAME [[graft.operators.Profile.psiDrift]] the batch path uses (the
    * engine's one definition of PSI — binning, clamping, eps smoothing and
    * rounding cannot drift between batch and stream), and append one
    * summary row (batch_id, n_rows, psi) to a parquet table — the shape a
    * retrain-trigger or alerting job tails.
    *
    * The reference side's bin bounds are re-derived each batch from `ref`:
    * pass a SMALL materialized snapshot (or a pre-aggregated sample), not
    * a lazy plan over the full corpus, or every micro-batch pays a corpus
    * scan. Empty batches append nothing (no distribution to score).
    *
    * Replay-idempotent: each batch writes its summary into its OWN
    * `batch_id=<id>` partition directory with overwrite, so a crash after
    * the write but before the checkpoint commit re-runs the batch into
    * the same partition instead of appending a duplicate row (readers see
    * `batch_id` as a partition column via discovery). The batch is
    * evaluated twice per trigger (one count doubling as the emptiness
    * guard, one psi scan) — the minimum for this shape.
    * Returns the query; callers own lifecycle. */
  /** Per-batch trending sink: each micro-batch's windowed top-k keys
    * land as one parquet partition — the live "what is spiking right now"
    * dashboard feed, applying the BATCH
    * [[graft.operators.Events.trendingKeys]] verbatim per batch (shared
    * code, so the stream cannot diverge from the batch definition;
    * same discipline as [[psiDriftSink]]). Per-batch scope is the
    * deliberate semantic: ranks reflect the batch that just arrived,
    * which is what an operational trending panel shows; a cross-batch
    * all-time ranking belongs to the batch job over the landed history.
    * Replay-idempotent: the partition is keyed by batch_id and
    * overwritten whole. */
  def trendingSink(
      stream: DataFrame, outPath: String, checkpointDir: String,
      keyCol: String = "event_type", unit: String = "hour", k: Int = 3)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "stream must be a streaming DataFrame")
    require(k >= 1, s"k must be >= 1, got $k")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.trendingKeys(batch, "ts", keyCol, unit, k)
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$id")
        }
        (): Unit
      }
      .start()
  }

  def psiDriftSink(
      stream: DataFrame, ref: DataFrame, valueCol: String,
      outPath: String, checkpointDir: String,
      nBins: Int = 10): org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "stream must be a streaming DataFrame")
    require(!ref.isStreaming, "ref must be a static reference snapshot")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        val n = batch.count()
        if (n > 0) {
          graft.operators.Profile.psiDrift(ref, batch, valueCol, nBins)
            .agg(coalesce(sum(col("psi_term")), lit(0.0)).as("psi"))
            .select(lit(n).as("n_rows"), col("psi"))
            .write.mode("overwrite").parquet(s"$outPath/batch_id=$id")
        }
        (): Unit
      }
      .start()
  }

  /** Streaming seasonal-anomaly scorer: watermarked tumbling hour counts,
    * each CLOSED window scored against a STORED (dow × hod) baseline
    * table ([[graft.operators.Profile.seasonalCells]], trained on the
    * batch corpus) through the SAME
    * [[graft.operators.Profile.seasonalZ]] expression the batch scan
    * applies — "is this hour's traffic unusual for a Tuesday 3am?",
    * continuously, with batch/stream score parity by construction.
    *
    * Emits one append-mode row per closed hour:
    * (slot, dow, hod, n, k, z). Windows only close when the watermark
    * passes them (`lateness`), so partial hours are never scored against
    * full-hour baselines — the error a naive per-micro-batch scorer
    * makes. Cells missing from the baseline (a dow×hod never observed
    * in training) drop with the inner join: no baseline, no score —
    * surface new cells by retraining, same contract as
    * [[graft.streaming.DocStreams.qualityGate]]'s missing strata.
    *
    * Scale shape: one watermarked streaming aggregation keyed on the
    * hour window; the ≤168-row baseline broadcast-joins statelessly. */
  def seasonalScore(
      stream: DataFrame, cells: DataFrame,
      lateness: String = "1 hour"): DataFrame = {
    require(stream.isStreaming, "stream must be a streaming DataFrame")
    require(!cells.isStreaming, "cells must be a static seasonalCells table")
    val expected = Seq("dow", "hod", "k", "s_n", "sq_n")
    require(expected.forall(cells.columns.contains),
      s"cells must carry (${expected.mkString(", ")}) — the seasonalCells " +
        s"schema; got (${cells.columns.mkString(", ")})")
    // slot-alignment precondition: the batch side bins hours with
    // date_trunc (session-timezone wall clock) while the streaming
    // window() aligns to the Unix epoch — identical instants ONLY when
    // the session zone's UTC offset is whole-hour. In a fractional-offset
    // zone (+05:30 Kolkata, +05:45 Kathmandu) every streamed hour would
    // straddle two batch slots and the documented parity silently breaks,
    // so fail at construction instead. Checked at two instants half a
    // year apart to cover DST regimes (DST shifts are whole-hour in every
    // zone with a whole-hour base offset — the one historical exception,
    // Lord Howe's +30 min DST, has a fractional base and is caught).
    val zone = java.time.ZoneId.of(
      stream.sparkSession.sessionState.conf.sessionLocalTimeZone)
    val probes = Seq(java.time.Instant.now,
      java.time.Instant.now.plusSeconds(26L * 7 * 24 * 3600))
    require(probes.forall(i =>
      zone.getRules.getOffset(i).getTotalSeconds % 3600 == 0),
      s"seasonalScore: session timezone $zone has a fractional-hour UTC " +
        "offset — epoch-aligned streaming windows cannot match the batch " +
        "side's wall-clock hour slots; run the session in a whole-hour zone")
    stream
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("slot"), col("n"))
      .withColumn("dow", dayofweek(col("slot")))
      .withColumn("hod", hour(col("slot")))
      .join(broadcast(cells), Seq("dow", "hod"))
      .withColumn("z", graft.operators.Profile.seasonalZ)
      .select("slot", "dow", "hod", "n", "k", "z")
  }

  /** The shared scaffolding of the monoid-merge maintenance sinks
    * ([[zoneMapSink]], [[countRollupSink]]): per non-empty micro-batch,
    * recover any half-finished swap, skip re-delivered batches (the
    * `last_batch_id` column is atomic with the swap — a sidecar file
    * could not be), summarize the batch, merge with the stored table
    * through the caller's associative+commutative re-aggregation, and
    * publish with write-then-swap. Idempotence under at-least-once
    * replay and batch-cut-invariance both follow from the monoid
    * contract; each concrete sink only supplies `summarize` + `merge`. */
  private def monoidMergeSink(
      stream: DataFrame, tablePath: String, checkpointDir: String)(
      summarize: Dataset[org.apache.spark.sql.Row] => DataFrame)(
      merge: (DataFrame, DataFrame) => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(stream.isStreaming, "stream must be a streaming DataFrame")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val live = new org.apache.hadoop.fs.Path(tablePath)
          val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
          graft.engine.Sinks.recoverSwap(fs, live) // we read `live` next
          val stored =
            if (fs.exists(live)) Some(spark.read.parquet(tablePath)) else None
          // batch→streaming handoff: a pre-existing BATCH-written table
          // has no `last_batch_id` column — treat it as seeded state
          // (merge, no replay skip; the column appears on the first
          // publish). The seed must match the sink's OWN schema: for
          // zoneMapSink that is a materialized Profile.zoneMap frame
          // (zone, n_rows, v_min, v_max) — NOT writeZoneMapped's sidecar,
          // whose (zoneCol, <col>_min, <col>_max, n_rows) shape needs a
          // rename/reshape before adoption. A NULL max (zero-row table)
          // likewise cannot have applied this batch.
          val alreadyApplied = stored.exists { prev =>
            prev.columns.contains("last_batch_id") && {
              val m = prev.agg(max(col("last_batch_id"))).head
              !m.isNullAt(0) && m.getLong(0) >= id
            }
          }
          if (!alreadyApplied) {
            val fresh = summarize(batch)
            val merged = stored match {
              case Some(prev) => merge(fresh, prev.drop("last_batch_id"))
              case None => fresh
            }
            merged.withColumn("last_batch_id", lit(id))
              .write.mode("overwrite").parquet(tablePath + ".tmp")
            graft.engine.Sinks.swapInto(fs, live)
          }
        }
        (): Unit
      }
      .start()
  }

  /** Incremental count-rollup maintenance: keep a grouped-count table
    * (the dashboard/rollup materialization — counts per (day, type), per
    * source, per shard …) current as data streams in, without ever
    * re-scanning history. `keys` are the grouping expressions (aliased
    * Columns — e.g. `date_trunc("day", col("ts")).as("day"),
    * col("event_type")`); the maintained table is (keys…, n).
    *
    * Same contract as [[zoneMapSink]] with the count monoid (SUM merge):
    * batch-cut-invariant, crash-safe, replay-idempotent — see
    * [[monoidMergeSink]]. Key expressions must be DETERMINISTIC in the
    * row. Returns the query; callers own lifecycle. */
  def countRollupSink(
      stream: DataFrame, keys: Seq[org.apache.spark.sql.Column],
      tablePath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(keys.nonEmpty, "countRollupSink needs at least one grouping key")
    // resolve the key OUTPUT names eagerly against an empty twin of the
    // stream's schema: the merge recovers keys as "every column but n",
    // so a key that RESOLVES to the name "n" would silently vanish from
    // the merge groupBy and collapse counts across it — fail at
    // construction, not after the rollup has been quietly wrong
    val keyNames = stream.sparkSession
      .createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        stream.schema)
      .groupBy(keys: _*).agg(count(lit(1)).as("__probe"))
      .columns.filterNot(_ == "__probe").toSeq
    require(!keyNames.contains("n"),
      s"countRollupSink: a grouping key resolves to the reserved column " +
        s"name 'n' (keys: ${keyNames.mkString(", ")}) — alias it; 'n' is " +
        "the maintained count column")
    monoidMergeSink(stream, tablePath, checkpointDir) { batch =>
      batch.groupBy(keys: _*).agg(count(lit(1)).as("n"))
    } { (fresh, prev) =>
      fresh.unionByName(prev)
        .groupBy(keyNames.map(col): _*)
        .agg(sum(col("n")).as("n"))
    }
  }

  /** Incremental zone-map maintenance: keep a data-skipping statistics
    * table ([[graft.operators.Profile.zoneMap]]'s (zone, n_rows, v_min,
    * v_max) schema) up to date as data streams in — the index that lets
    * batch scans prune zones ([[graft.operators.Profile.zoneSkipAudit]])
    * without a full rebuild after every ingest tick.
    *
    * Merge semantics are the zone-stat monoid: per micro-batch, compute
    * the batch's per-zone stats, union with the stored table, and
    * re-aggregate (sum counts, min mins, max maxes) — associative and
    * commutative, so HOWEVER the stream is cut into batches the final
    * table equals the batch operator on the concatenated data
    * (StreamingSpec pins this parity). Stats only ever widen; zone
    * REWRITES (delete/compact) need a rebuild, same as every zone-map
    * implementation.
    *
    * The table is rewritten with the shared write-then-swap discipline
    * ([[graft.engine.Sinks.swapInto]] — readers see old or new, never
    * half) and recoverSwap runs BEFORE the read, so a crash between the
    * swap's renames cannot make a replayed batch rebuild from its own
    * rows alone. Rewriting |zones| rows per batch is the deliberate
    * cost: the table is ~bytes per ingest unit (file/hour/shard), far
    * smaller than the data, and a rewrite keeps it one self-contained
    * parquet readers scan in one footer read.
    *
    * REPLAY idempotence — foreachBatch is at-least-once (a crash after
    * the swap publishes but before the streaming checkpoint commits
    * re-delivers the same micro-batch), and the zone-stat merge is
    * additive, so a naive re-merge would double-count n_rows. The table
    * therefore carries a constant `last_batch_id` column, atomic with
    * the stats because it rides the same swap: a batch whose id is ≤ the
    * stored one has already been applied and is skipped wholesale. (A
    * sidecar file would reopen the hole — it cannot be published
    * atomically with the table.)
    *
    * `zoneExpr` must be DETERMINISTIC in the row (an id range, a time
    * bucket) — a nondeterministic zone would re-zone replayed rows and
    * double-count. Returns the query; callers own lifecycle. */
  def zoneMapSink(
      stream: DataFrame, zoneExpr: org.apache.spark.sql.Column,
      valueCol: String, tablePath: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    monoidMergeSink(stream, tablePath, checkpointDir) { batch =>
      graft.operators.Profile.zoneMap(batch, zoneExpr, valueCol)
    } { (fresh, prev) =>
      fresh.unionByName(prev)
        .groupBy("zone")
        .agg(sum(col("n_rows")).as("n_rows"),
          min(col("v_min")).as("v_min"),
          max(col("v_max")).as("v_max"))
    }

  /** Streaming CDC apply: maintain a keyed parquet table from a stream of
    * upsert records — each micro-batch merges into the table through the
    * SAME [[graft.engine.Ops.upsert]] the batch path uses (whole-row
    * replace, insert on new keys), so batch and streaming merges cannot
    * drift semantically.
    *
    * foreachBatch is the standard pattern for merge sinks on plain
    * parquet (streaming writers are append-only; MERGE needs a
    * read-modify-write): each batch is deduped to its LAST record per key
    * (by `seqCol` descending, ties broken by the remaining columns'
    * values), merged, and swapped in via [[graft.engine.Sinks.swapInto]]
    * so readers never see a half-written table.
    *
    * Replay determinism contract: every non-key column must be of an
    * ORDERABLE type (no MapType, no VariantType) — validated eagerly at
    * sink construction with a clear error, not inside the first
    * micro-batch. Given that, the (seq desc, remaining columns desc)
    * sort is a total order over distinct records, so a replayed batch
    * picks the same winner; two fully IDENTICAL records tie harmlessly
    * (either pick is byte-equal), and NaN doubles order by Spark's own
    * NaN-greatest rule, which is at least self-consistent across a
    * replay on the same engine. Replay safety needs the recovery
    * step too: a crash between the swap's two renames leaves the table
    * only at `.old`, and re-running the batch against a missing live path
    * would rebuild the table from the batch alone — so the batch calls
    * recoverSwap BEFORE reading.
    *
    * Scale shape: the merge is one full-outer join per micro-batch keyed
    * on `keyCols` — batch-side small, table-side the live state; on a real
    * deployment the table would be bucketed on the key to make the
    * per-batch join shuffle-free (see [[graft.engine.Sinks.writeBucketed]]).
    * Returns the query; callers own lifecycle. */
  /** `opCol`: optional CDC op column — when set, batch records whose op is
    * `"D"` DELETE their key from the table (via [[graft.engine.Ops.applyCdc]])
    * and every other op value upserts; the op column itself never reaches
    * the maintained table. Without it, every record is an upsert.
    *
    * Delete tombstones: removing a key's row would also remove its seq
    * watermark, so a lagging source partition delivering a STALE (lower-seq)
    * pre-delete upsert in a later batch would pass the freshness check (no
    * live row) and resurrect the deleted key. The sink therefore keeps a
    * sidecar table at `tablePath + ".tombstones"` of (key, delete seq):
    * batch records older than their key's tombstone are dropped, records at
    * or above it pass (same tie rule as the live-row check, so a replayed
    * delete batch stays idempotent) and a passing upsert recreates the key
    * AND clears its tombstone. The sidecar is swapped with the same
    * write-then-swap discipline as the table; it grows with the count of
    * currently-deleted keys (keys, not rows — re-created keys leave it),
    * which is the price of the guarantee. */
  def upsertSink(
      stream: DataFrame, tablePath: String, keyCols: Seq[String], seqCol: String,
      checkpointDir: String,
      opCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.expressions.Window
    // name comparison must track the session's caseSensitive setting (Spark
    // resolves columns case-insensitively by default): a differently-cased
    // key or seq name would otherwise be classified as a tiebreak column by
    // the sort while the engine still resolves it as the key/seq
    val caseSensitive = stream.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def sameName(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    // Fail at construction, not inside foreachBatch: EVERY column
    // participates at runtime — keyCols partition the window and key the
    // merge join, seqCol leads the orderBy, and the remaining columns form
    // the replay-deterministic tiebreak sort — so each must resolve and be
    // orderable (orderable also covers grouping/join legality: the
    // ungroupable types, map and variant, are exactly the unorderable ones).
    // Resolve every caller-supplied name to the stream's ACTUAL field name
    // once, here. Analysis resolves case-insensitively, but downstream
    // plain-string code does not: Ops.upsert filters dataCols by exact
    // string (a differently-cased key would survive as a "data" column and
    // duplicate the key in the merge output), and Ops.applyCdc requires
    // the op column by exact name — both would pass construction and then
    // kill the stream on the first non-bootstrap micro-batch.
    def resolved(c: String, role: String): String =
      stream.schema.fields.map(_.name).find(sameName(_, c)).getOrElse(
        throw new IllegalArgumentException(
          s"upsertSink: $role column '$c' not found in the stream schema " +
            s"(${stream.schema.fields.map(_.name).mkString(", ")})"))
    val keys = keyCols.map(resolved(_, "key"))
    val seq = resolved(seqCol, "seq")
    val op = opCol.map(resolved(_, "op"))
    locally {
      val unorderable = stream.schema.fields.filterNot(f =>
        org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(f.dataType))
      require(unorderable.isEmpty,
        "upsertSink requires every column to be orderable (keys partition and " +
          "join, seqCol orders, remaining columns form the replay-deterministic " +
          "tiebreak); unorderable: " +
          unorderable.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    }
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark: SparkSession = batch.sparkSession
        // an empty trigger (continuous when any query in the session uses
        // processing-time timeouts) must not read + full-outer-merge +
        // rewrite + swap the whole table for zero changes
        if (!batch.isEmpty) {
        // seq desc, then every remaining column: a total order, so ties on
        // (key, seq) resolve identically when the batch replays
        val tiebreak = batch.columns.toSeq
          .filterNot(c => keys.contains(c) || c == seq) // names pre-resolved
          .map(col(_).desc)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(seq).desc +: tiebreak: _*)
        val lastPerKey = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val live = new org.apache.hadoop.fs.Path(tablePath)
        val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
        graft.engine.Sinks.recoverSwap(fs, live) // we read `live` next
        // cross-BATCH sequence guard: lastPerKey orders only within the
        // micro-batch, but a lagging source partition can deliver a STALE
        // (lower-seq) record for a key a previous batch already advanced —
        // whole-row replacing with it would regress the table. The table
        // stores seqCol, so drop batch records older than the live row
        // (ties pass: replaying the winning batch must stay idempotent).
        def freshOnly(table: DataFrame): DataFrame = {
          val liveSeq = table.select(
            (keys.map(col) :+ col(seq).as("__live_seq")): _*)
          lastPerKey.join(liveSeq, keys, "left")
            .filter(col("__live_seq").isNull || col(seq) >= col("__live_seq"))
            .drop("__live_seq")
        }
        op match {
          case Some(oc) =>
            // CDC mode: tombstone sidecar guards deleted keys (see Scaladoc)
            val tombPath = tablePath + ".tombstones"
            val tombLive = new org.apache.hadoop.fs.Path(tombPath)
            graft.engine.Sinks.recoverSwap(fs, tombLive)
            val tomb: Option[DataFrame] =
              if (fs.exists(tombLive)) Some(spark.read.parquet(tombPath)) else None
            // drop records older than their key's tombstone; ties pass
            // (replaying the batch whose delete MADE the tombstone must
            // re-apply as a no-op, same rule as the live-seq tie)
            def tombFresh(df: DataFrame): DataFrame = tomb match {
              case Some(t) =>
                val ts = t.select(keys.map(col) :+ col(seq).as("__tomb_seq"): _*)
                df.join(ts, keys, "left")
                  .filter(col("__tomb_seq").isNull || col(seq) >= col("__tomb_seq"))
                  .drop("__tomb_seq")
              case None => df
            }
            val fresh = tombFresh(
              if (fs.exists(live)) freshOnly(spark.read.parquet(tablePath))
              else lastPerKey)
            val isDel = upper(col(oc)) === "D" // NULL op upserts (isNull below)
            val merged =
              if (fs.exists(live))
                graft.engine.Ops.applyCdc(spark.read.parquet(tablePath), fresh, keys, oc)
              // no table yet: the first batch bootstraps it — deletes of
              // never-seen keys are no-ops and must not land as rows (but
              // they DO tombstone below, so a stale pre-delete upsert
              // arriving after the bootstrap cannot resurrect the key)
              else fresh.filter(col(oc).isNull || !isDel).drop(oc)
            // next tombstone set: prior tombstones minus keys this batch
            // recreated, plus this batch's deletes; max-seq per key (a key
            // re-deleted keeps the newest delete's watermark). lastPerKey is
            // one row per key, so a key is a delete XOR an upsert here.
            val newDels = fresh.filter(isDel).select(keys.map(col) :+ col(seq): _*)
            val upKeys = fresh.filter(col(oc).isNull || !isDel).select(keys.map(col): _*)
            val prevTomb = tomb.map(_.select(keys.map(col) :+ col(seq): _*))
              .getOrElse(newDels.limit(0))
            val newTomb = prevTomb.join(upKeys, keys, "left_anti")
              .unionByName(newDels)
              .groupBy(keys.map(col): _*).agg(max(col(seq)).as(seq))
            // BOTH plans execute (to .tmp) before EITHER swap: merged and
            // newTomb each re-read the tombstone path lazily, and the swap
            // deletes the old files — executing after a swap would read a
            // moved-out-from-under file listing. After both .tmp dirs are
            // complete, tombstones swap BEFORE the table: if the batch dies
            // between the swaps, the replay's delete rows tie their own
            // tombstone seq and re-apply idempotently, whereas the reverse
            // order would open a window where the table advanced but a
            // stale upsert could still slip past
            newTomb.write.mode("overwrite").parquet(tombPath + ".tmp")
            merged.write.mode("overwrite").parquet(tablePath + ".tmp")
            graft.engine.Sinks.swapInto(fs, tombLive)
            graft.engine.Sinks.swapInto(fs, live)
          case None =>
            val merged =
              if (fs.exists(live)) {
                val table = spark.read.parquet(tablePath)
                graft.engine.Ops.upsert(table, freshOnly(table), keys)
              } else lastPerKey // no table yet: first batch bootstraps it
            // write-then-swap (same discipline as Sinks.publish/compact):
            // the merged table fully materializes into .tmp, then two
            // metadata renames swap it live — never a delete-first window
            // whose length scales with table size
            merged.write.mode("overwrite").parquet(tablePath + ".tmp")
            graft.engine.Sinks.swapInto(fs, live)
        }
        } // batch.isEmpty guard
        (): Unit
      }
      .start()
  }
}
