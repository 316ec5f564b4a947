package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference lacks but any event pipeline needs: as-of
  * (latest right row at-or-before each left row, per key) and bounded
  * range joins.
  *
  * The as-of join deliberately avoids the naive range join + row_number
  * (which explodes every left row by its full right history before
  * discarding all but one). Instead: tag both sides, UNION them, and take
  * `last(payload, ignoreNulls)` over a (key, ts, side)-ordered running
  * window. One shuffle on the key, no intermediate blow-up, O(left+right)
  * rows throughout — this is the composition-first answer (SURVEY §4.3
  * preference (a)) and scales linearly where the join formulation is
  * quadratic in history depth.
  */
object Temporal {

  /** For each left row, copy columns from the NEAREST right row of the
    * same `key` in the given `direction`:
    *  - "backward" (default): the LATEST right row with
    *    `right.ts <= left.ts` — "the last known measurement";
    *  - "forward": the EARLIEST right row with `right.ts >= left.ts` —
    *    "the next reading" (label-after-event joins, next-price lookups).
    * Both inclusive; ties: the right row wins, so a same-instant
    * measurement is visible. `tolerance` (an INTERVAL expression, e.g.
    * "INTERVAL 1 HOUR") bounds the staleness/lookahead: a match farther
    * than that from the left row yields NULL copies instead — without a
    * bound, a backward as-of happily joins a year-stale reading and the
    * error is silent. Unmatched left rows get NULLs. `copies` maps
    * destination column -> right column. Right rows must be unique per
    * (key, ts) — pre-dedup with a window if not.
    *
    * The forward direction is the SAME union + running-window plan with
    * the window order reversed — still one shuffle on the key, no range
    * explosion; tolerance is a map-side projection over the matched
    * timestamp carried in the payload. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      copies: Map[String, String],
      direction: String = "backward",
      tolerance: Option[String] = None): DataFrame = {
    require(Set("backward", "forward").contains(direction),
      s"direction must be backward|forward, got $direction")
    // the matched row's ts rides in the payload so tolerance can compare
    // it against the left ts after the window fill
    val payload = struct(
      copies.values.toSeq.distinct.map(col) :+ col(tsCol).as("__mts"): _*)
    // ASOF semantics: a NULL key or NULL ts on the right matches nothing
    // (SQL comparison is never true). Without this filter Spark's
    // nulls-first ordering would sort NULL-ts right rows before every left
    // row and leak their payload into unmatched rows.
    val r = right
      .filter(col(key).isNotNull && col(tsCol).isNotNull)
      .select(
        col(key).as("__k"), col(tsCol).as("__ts"),
        lit(0).as("__side"), payload.as("__payload"))
    val payloadType = r.schema("__payload").dataType
    val l = left
      .withColumn("__k", col(key)).withColumn("__ts", col(tsCol))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts -> inclusive
    // in BOTH directions; forward simply walks time reversed. NULL-ts
    // LEFT rows must sort before every right row in either walk (asc is
    // nulls-first already; desc defaults to nulls-LAST, which would hand
    // a NULL-ts left row the last payload of the reversed walk instead of
    // the NULL that NULL >= t semantics demand), hence desc_nulls_first.
    val ord =
      if (direction == "backward") col("__ts").asc else col("__ts").desc_nulls_first
    val w = Window.partitionBy("__k").orderBy(ord, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))
    val leftOnly = filled.filter(col("__side") === 1)
    val inTol: Column = tolerance match {
      case None => lit(true)
      case Some(t) if direction == "backward" =>
        col("__ts") <= col("__match.__mts") + expr(t)
      case Some(t) =>
        col("__match.__mts") <= col("__ts") + expr(t)
    }
    val withCopies = copies.foldLeft(leftOnly) { case (df, (dst, src)) =>
      df.withColumn(dst, when(inTol, col(s"__match.$src")))
    }
    withCopies.drop("__k", "__ts", "__side", "__payload", "__match")
  }

  /** [[asofJoin]] in the NEAREST direction (pandas merge_asof
    * `direction="nearest"`): each left row copies from whichever of its
    * latest-at-or-before and earliest-at-or-after right rows is closer in
    * time, ties to the backward match (the stale-but-known reading beats
    * the future one at equal distance — the reproducible choice pandas
    * also makes). `tolerance` bounds each direction independently before
    * the distance compare, so a "nearest" match is never farther than the
    * bound in its own direction. Distances compare as exact epoch-micros
    * BIGINTs — no FP.
    *
    * Built as the composition of the two directed passes (two key
    * shuffles, no range explosion) rather than a third bespoke window
    * walk — the directed semantics stay defined in exactly one place. */
  def asofJoinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsCol: String,
      copies: Map[String, String],
      tolerance: Option[String] = None): DataFrame = {
    require(!copies.keySet.exists(k => k.endsWith("__b") || k.endsWith("__f")),
      "copy destinations may not end in the reserved __b/__f suffixes")
    val withB = asofJoin(left, right, key, tsCol,
      copies.map { case (d, s) => (d + "__b", s) } + ("__bts" -> tsCol),
      direction = "backward", tolerance = tolerance)
    val both = asofJoin(withB, right, key, tsCol,
      copies.map { case (d, s) => (d + "__f", s) } + ("__fts" -> tsCol),
      direction = "forward", tolerance = tolerance)
    val takeB = col("__bts").isNotNull && (col("__fts").isNull ||
      (unix_micros(col(tsCol)) - unix_micros(col("__bts"))) <=
        (unix_micros(col("__fts")) - unix_micros(col(tsCol))))
    copies.keys.foldLeft(both) { (df, dst) =>
      df.withColumn(dst,
        when(takeB, col(dst + "__b")).otherwise(col(dst + "__f")))
    }.drop(copies.keys.flatMap(d => Seq(d + "__b", d + "__f")).toSeq ++
        Seq("__bts", "__fts"): _*)
  }

  /** Bounded range join: pairs (l, r) with equal `key` and `r.ts` in
    * (l.ts, l.ts + window]. The key equality makes this a shuffled
    * equi-join with a residual range predicate — scalable, unlike a pure
    * theta join. */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      key: String, tsCol: String, windowExpr: String,
      leftPrefix: String = "l_", rightPrefix: String = "r_"): DataFrame = {
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, leftPrefix + c))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, rightPrefix + c))
    l.join(r,
      col(leftPrefix + key) === col(rightPrefix + key) &&
        col(rightPrefix + tsCol) > col(leftPrefix + tsCol) &&
        col(rightPrefix + tsCol) <= col(leftPrefix + tsCol) + expr(windowExpr))
  }

  /** Interval-overlap join: pairs (l, r) whose CLOSED time intervals
    * [start, end] intersect — concurrency analysis, ad-exposure ↔ session
    * attribution, downtime ↔ job-run blame. No key equality exists to
    * hang an equi-join on, and the pure theta join
    * `l.s <= r.e AND r.s <= l.e` is a cartesian — so this uses the
    * standard BUCKETIZATION: both sides explode into the `unit`-sized
    * time buckets their interval touches, the join runs as an EQUI-join
    * on the bucket, the residual overlap predicate filters
    * bucket-cograined false pairs, and `distinct` collapses pairs that
    * met in several buckets. Candidates are bounded by per-bucket
    * concurrency products instead of |L|·|R|.
    *
    * `unit` trades fan-out against candidate tightness: pick it near the
    * typical interval length (intervals spanning many buckets duplicate
    * that many times — still linear; a unit far larger than the
    * intervals degrades toward per-bucket cartesians). Returns the
    * prefixed key columns plus both intervals, one row per overlapping
    * pair. NULL interval bounds drop (overlap is undefined); an INVERTED
    * interval (end before start) fails loudly — it is corruption, not a
    * definable empty interval, and letting `sequence` throw its own
    * obscure error (or silently dropping the evidence) would hide it.
    * Callers joining a side with itself pass an id filter or dedupe a<b
    * downstream. Key columns named `start`/`end` are rejected — they
    * would collide with the emitted interval-bound aliases. */
  def intervalOverlapJoin(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      unit: String = "hour",
      leftPrefix: String = "a_", rightPrefix: String = "b_"): DataFrame = {
    require(leftKeys.nonEmpty && rightKeys.nonEmpty,
      "interval join needs identity columns to report pairs by")
    require(!(leftKeys ++ rightKeys).exists(k => k == "start" || k == "end"),
      "key columns named 'start'/'end' collide with the emitted interval " +
        "bound aliases — rename or alias them first")
    def buckets(df: DataFrame, s: String, e: String, keys: Seq[String],
        prefix: String) = {
      val guardedEnd = when(col(e) < col(s), raise_error(concat(
        lit(s"intervalOverlapJoin: inverted interval ($s > $e): "),
        col(s).cast("string"), lit(" > "), col(e).cast("string"),
        lit(" — fix the feed; overlap of an inverted interval is undefined")))
        .cast(df.schema(e).dataType))
        .otherwise(col(e))
      df.filter(col(s).isNotNull && col(e).isNotNull)
        .select(keys.map(k => col(k).as(prefix + k)) ++ Seq(
          col(s).as(prefix + "start"), col(e).as(prefix + "end"),
          explode(sequence(date_trunc(unit, col(s)),
            date_trunc(unit, guardedEnd),
            expr(s"INTERVAL 1 $unit"))).as("__bucket")): _*)
    }
    val l = buckets(left, lStart, lEnd, leftKeys, leftPrefix)
    val r = buckets(right, rStart, rEnd, rightKeys, rightPrefix)
    l.join(r, "__bucket")
      .filter(col(leftPrefix + "start") <= col(rightPrefix + "end") &&
        col(rightPrefix + "start") <= col(leftPrefix + "end"))
      .drop("__bucket")
      .distinct()
  }

  /** Interval-union coverage per key (the gaps-and-islands merge): total
    * time covered by the UNION of a key's half-open [start, end)
    * intervals, counting overlap once — uptime from session spans,
    * active-time from padded event windows, SLA coverage from incident
    * intervals. Naive `sum(end − start)` double-counts every overlap;
    * this merges first. Returns
    * (key, n_intervals, n_islands, covered_us) — islands are the merged
    * maximal runs; all three outputs exact BIGINTs (epoch micros), no FP
    * anywhere. Intervals that touch (`start = running max end`) merge
    * (half-open adjacency is contiguous coverage); NULL keys, NULL
    * endpoints, and empty/negative intervals (end ≤ start) drop — they
    * have no extent and would poison the running max with NULL.
    *
    * Scale shape: ONE shuffle on the key; the classic two-window pass
    * (running max end → island flags → island ids) ordered by
    * (start, end), then two partial-aggregated rollups. Window
    * partitions are one key's intervals — no global sort. */
  def intervalUnion(
      df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val s = unix_micros(col(startCol))
    val e = unix_micros(col(endCol))
    val base = df
      .filter(col(keyCol).isNotNull && col(startCol).isNotNull &&
        col(endCol).isNotNull && e > s)
      .select(col(keyCol).as("key"), s.as("s"), e.as("e"))
    val prev = Window.partitionBy("key").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy("key").orderBy("s", "e")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("__newIsland",
        when(col("s") > coalesce(max(col("e")).over(prev), lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__newIsland")).over(run))
      .groupBy("key", "__island")
      .agg(count(lit(1)).as("__n"),
        (max(col("e")) - min(col("s"))).as("__span"))
      .groupBy("key")
      .agg(sum(col("__n")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__span")).as("covered_us"))
  }
}
