package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-shaping, join, and aggregation operators (SURVEY §2.2-§2.4).
  *
  * Each function re-expresses one arcpy dataflow operator from
  * /root/reference/src/wins_transform_staging.py as a pure, lazy
  * `DataFrame => DataFrame` transform. Nothing here materializes; the caller
  * composes one Catalyst plan per output table (SURVEY §3.3), so the whole
  * reference pipeline fuses into a handful of stages instead of the
  * reference's ~15 eager FGDB writes.
  */
object Ops {

  /** R1 — schema-lenient append (`Append_management(..., "NO_TEST")`,
    * wins_transform_staging.py:151-155,254,264): rows matched to the target
    * schema by column NAME; source columns missing from the target are
    * dropped, target columns missing from the source become NULL. Output
    * schema is exactly the target's.
    */
  def appendNoTest(target: DataFrame, src: DataFrame): DataFrame = {
    // NO_TEST (and Spark's unionByName) match column names case-insensitively;
    // rename shared source columns to the target's exact spelling so a column
    // differing only in case is appended, not dropped and null-filled.
    val targetByLower = target.columns.map(c => c.toLowerCase -> c).toMap
    val shared = src.columns.filter(c => targetByLower.contains(c.toLowerCase))
    // two source columns differing only in case would collapse onto the same
    // target spelling and emit a duplicate column — fail with the column
    // names instead of a downstream ambiguous-reference error
    val collided = shared.groupBy(_.toLowerCase).collect {
      case (_, cs) if cs.length > 1 => cs.mkString("/")
    }
    require(collided.isEmpty,
      s"appendNoTest: source columns differ only in case: ${collided.mkString(", ")}")
    val pruned = src.select(shared.map(c => col(c).as(targetByLower(c.toLowerCase))).toIndexedSeq: _*)
    target.unionByName(pruned, allowMissingColumns = true)
  }

  /** R3 — attribute selection (`SelectLayerByAttribute`, :168-170,190,249).
    * A "selection set" is just a predicate; subsequent ops thread it through
    * as a filter or a `when` guard — no runtime selection state needed
    * (SURVEY §7.4.3).
    */
  def select(df: DataFrame, pred: Column): DataFrame = df.filter(pred)

  /** R4 — conditional constant assignment (`CalculateField` on a layer with
    * an active selection, :168-171,197,209): set `field` to `value` on rows
    * matching `pred`, keep the prior value elsewhere.
    */
  def calcWhen(df: DataFrame, field: String, pred: Column, value: Column): DataFrame =
    df.withColumn(field, when(pred, value).otherwise(col(field)))

  /** R4 (unconditional form, :197,209). */
  def calc(df: DataFrame, field: String, value: Column): DataFrame =
    df.withColumn(field, value)

  /** R5 — blank→NULL normalization (:190-192,216-220,228-232). The reference
    * selects `tag = ''` then `CalculateField(tag, 'None')`; arcpy Python
    * `None` writes SQL NULL, not the string "None" (SURVEY §1.2).
    */
  def blankToNull(df: DataFrame, field: String): DataFrame =
    df.withColumn(field, when(col(field) === lit(""), lit(null)).otherwise(col(field)))

  /** R6 — delete selected rows (`DeleteFeatures_management`, :255,265): keep
    * the complement of the selection. SQL where-clause semantics: a row is
    * selected only when `pred` is TRUE, so NULL-predicate rows survive the
    * delete (hence coalesce, not plain negation).
    */
  def deleteWhere(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))

  /** Deterministic first-match reduction of a join's right side (SURVEY
    * §7.3): ArcGIS `AddJoin` keeps only the FIRST matching right record per
    * key, so the left row count never multiplies (:176-179). FGDB "first" is
    * OID insertion order, which has no Spark analog; we pin it to
    * `row_number() == 1` over an explicit, caller-supplied ordering so the
    * result (and the DuckDB oracle) is reproducible.
    */
  def firstMatch(right: DataFrame, key: String, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order.toIndexedSeq: _*)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** J1/J2 — left-outer first-match equi-join + field copy
    * (AddJoin KEEP_ALL → CalculateField → RemoveJoin, :176-179,200-204).
    *
    * `copies` maps destination (left) column → source (right) column. ArcGIS
    * `CalculateField` after a KEEP_ALL join writes the joined value into
    * EVERY left row — NULL for unmatched rows, overwriting any prior value —
    * so this is a plain overwrite, NOT coalesce (SURVEY §7.3, pinned by
    * OpsSpec).
    *
    * Scale note: the right side is projected down to key+copied columns
    * before the join and broadcast when `broadcastRight` (the reference's
    * dimension snapshot at :174 is tiny); for a non-broadcastable right side
    * Catalyst falls back to a shuffled hash/sort-merge join on the key.
    */
  def joinEnrich(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      rightOrder: Seq[Column],
      copies: Map[String, String],
      broadcastRight: Boolean = true): DataFrame = {
    val needed = (rightKey +: copies.values.toSeq).distinct
    // firstMatch runs on the UNprojected right side: rightOrder may reference
    // columns (e.g. an OID/insertion-order column) that are not copied, and
    // projecting first would drop them. Catalyst's ColumnPruning still narrows
    // the scan to key + order + copied columns, so nothing extra is read.
    val pruned = firstMatch(right, rightKey, rightOrder)
      .select(needed.map(col).toIndexedSeq: _*)
    val renamed = pruned.toDF(pruned.columns.map("__r_" + _).toIndexedSeq: _*)
    val r = if (broadcastRight) broadcast(renamed) else renamed
    val joined = left.join(r, left(leftKey) === r("__r_" + rightKey), "left")
    val copied = copies.foldLeft(joined) { case (d, (dst, srcCol)) =>
      d.withColumn(dst, col("__r_" + srcCol))
    }
    copied.drop(renamed.columns.toIndexedSeq: _*)
  }

  /** A1 — Frequency (`Frequency_analysis`, :240-243): distinct key
    * combinations + count, optionally summing numeric fields (the tool's full
    * surface; the reference uses the single-key count form). Map-side partial
    * aggregation makes this a single shuffle on the group keys at any scale.
    */
  def frequency(df: DataFrame, keys: Seq[String], sums: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("FREQUENCY") +: sums.map(c => sum(col(c)).as(s"SUM_$c"))
    df.groupBy(keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** A2 — selected-row count (`Describe(layer).FIDSet`, :251-253,261-263):
    * the engine's only forced materialization besides sink writes.
    */
  def countSelected(df: DataFrame, pred: Column): Long = df.filter(pred).count()

  /** Skew-safe shuffled equi-join: salt the (skewed) left side into
    * `salts` sub-keys and replicate the right side once per salt, so a hot
    * key's rows spread over `salts` reducers instead of one straggler.
    *
    * Semantically identical to `left.join(right, leftKey === rightKey,
    * joinType)` (pinned in OpsSpec). Use when AQE's skew-join splitting
    * can't help — e.g. the skewed side feeds an aggregation, or the
    * runtime stats miss the skew. Right side grows `salts`x: keep it the
    * dimension side. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit `salts` copies of unmatched right rows
    // (they exist once per replica): restrict to the safe types.
    require(Set("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, not $joinType")
    // the salt must be DETERMINISTIC per row: a nondeterministic source
    // (row id, rand) used as a join key can lose/duplicate rows when a
    // stage retry recomputes different salts than the first attempt saw.
    // Hash the full row content instead — identical rows share a salt,
    // which is harmless (they share the join key anyway).
    val sl = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val sr = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sl.join(sr, sl(leftKey) === sr(rightKey) && sl("__salt") === sr("__salt"), joinType)
      .drop("__salt")
  }

  /** Bloom-prefiltered semi-join: keep fact rows whose key appears in
    * `dim`, pre-filtering the fact side with a compact Bloom filter of the
    * dim keys BEFORE the exact semi-join removes the false positives.
    * Result is exactly `fact SEMI JOIN dim` (pinned by the DuckDB oracle
    * and OpsSpec); only the physical shape changes.
    *
    * Scale rationale — this is the manual form of Spark's runtime Bloom
    * pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`), for when
    * the planner can't inject it (dim computed in the same stage, non-AQE
    * paths, or a persisted filter reused across queries): a dim side too
    * big to broadcast as a hash relation (hundreds of millions of keys)
    * still fits as a Bloom filter (~1.2 GB at 10⁹ keys / 1% fpp, built with
    * a tree-aggregated constant-memory pass), and the map-side prefilter
    * cuts the fact side's shuffle volume from |fact| to
    * |matches| + fpp·|fact| before the exchange — at a 1% match rate,
    * a ~50x smaller shuffle for one extra scan of the dim keys.
    *
    * Keys are hashed as strings so any key type gets identical Bloom
    * hashing — and the dim key is first cast to the FACT key's type, so
    * both sides render the same value identically (a LONG 7 probe and a
    * DECIMAL(12,2) 7.00 build would otherwise hash "7" vs "7.00" and the
    * prefilter would drop a row the exact join matches; casting the build
    * side to the probe type makes the Bloom a superset of the coerced
    * join's matches — lossy casts can only add false positives, which the
    * exact semi-join removes). NULL fact keys never match (semi-join
    * semantics). `expectedItems` sizes the filter — overshoot is wasted
    * memory, undershoot inflates fpp, correctness is unaffected either
    * way. */
  def bloomSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    // composed from the standalone build/prefilter pieces — ONE definition
    // of the build cast and the membership probe, shared with the
    // persistent-filter path
    val factType = fact.schema(factKey).dataType
    val bf = buildBloom(
      dim.select(col(dimKey).cast(factType).as("__k")), "__k", expectedItems, fpp)
    bloomPrefilter(fact, factKey, bf)
      .join(dim.select(col(dimKey)), fact(factKey) === dim(dimKey), "left_semi")
  }

  /** Standalone Bloom build for PERSISTENT reuse — the piece
    * [[bloomSemiJoin]] keeps internal: a dim-key filter built once (e.g.
    * nightly, from the customer dimension) and reused by every downstream
    * job beats rebuilding it per query, and at 10⁹ keys the build is a
    * real cost. Keys hash as strings; cast the build side to the PROBE
    * side's type first (the [[bloomSemiJoin]] coercion discipline —
    * "7" vs "7.00" would otherwise miss). */
  def buildBloom(
      dim: DataFrame, key: String, expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter =
    dim.select(col(key).cast("string").as("__k"))
      .stat.bloomFilter("__k", expectedItems, fpp)

  /** Persist a Bloom filter to a Hadoop filesystem. Publication is a
    * rename-OVERWRITE of a per-writer unique temp file: writers never see
    * a half-written filter (readers open only the published path), and
    * concurrent writers cannot truncate each other's temp (unique names).
    * Atomicity honesty: FileContext's OVERWRITE rename is atomic where
    * the filesystem natively supports it (HDFS); on LocalFs/object-store
    * AbstractFileSystems the default implementation is delete-then-
    * rename, leaving a brief no-file window — [[loadBloom]] retries a
    * missing path a few times to ride that window out. A failed write or
    * rename deletes its temp before rethrowing (uniquely-named orphans
    * would otherwise accumulate forever). */
  def saveBloom(
      spark: SparkSession, bf: org.apache.spark.util.sketch.BloomFilter,
      path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = p.getFileSystem(conf)
    try {
      val out = fs.create(tmp, true)
      try bf.writeTo(out) finally out.close()
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: Throwable => () }
        throw e
    }
  }

  def loadBloom(
      spark: SparkSession, path: String): org.apache.spark.util.sketch.BloomFilter = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ride out a concurrent publisher's non-atomic overwrite window (see
    // saveBloom): a transiently missing path is retried briefly; a
    // genuinely absent filter still fails within ~1s
    var attempt = 0
    while (true) {
      try {
        val in = fs.open(p)
        try return org.apache.spark.util.sketch.BloomFilter.readFrom(in)
        finally in.close()
      } catch {
        case _: java.io.FileNotFoundException if attempt < 4 =>
          attempt += 1; Thread.sleep(200L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Map-side Bloom prefilter with a stored/loaded filter: keeps rows the
    * filter might contain (plus false positives at the filter's fpp —
    * compose with the exact semi-join to remove them, exactly as
    * [[bloomSemiJoin]] does internally). NULL keys drop (semi-join
    * semantics). The filter broadcasts once per query. */
  def bloomPrefilter(
      fact: DataFrame, key: String,
      bf: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: String) => k != null && bcast.value.mightContainString(k))
    fact.filter(might(col(key).cast("string")))
  }

  /** Keyed upsert (CDC merge): rows in `updates` replace same-key rows in
    * `base` WHOLE-ROW — an update with a NULL column nulls the target, it
    * does not coalesce back to the base value — and keys absent from
    * `base` are inserted. Both sides must share the schema (matched by
    * name; order-insensitive).
    *
    * PRECONDITION: `keyCols` must be unique on EACH side. A duplicate key
    * would turn the full-outer join into a row-multiplying product instead
    * of a merge (SQL MERGE raises "multiple matches" here). The check is a
    * full groupBy-count pass per side, so it is opt-in via `validateKeys`
    * — enable it in debug/QA runs, skip it when uniqueness is already
    * enforced upstream (e.g. by a QA dup split).
    *
    * Scale shape: one full-outer shuffle join on the key columns — the
    * standard merge plan. The non-key payload rides each side as a single
    * struct, so the width of the table adds no join-key cost and the
    * presence test (`updates side matched?`) is one null check on the
    * struct, not per-column logic. */
  def upsert(
      base: DataFrame,
      updates: DataFrame,
      keyCols: Seq[String],
      validateKeys: Boolean = false): DataFrame = {
    require(base.columns.sorted.sameElements(updates.columns.sorted),
      s"upsert requires identical schemas: base=${base.columns.sorted.mkString(",")} " +
        s"updates=${updates.columns.sorted.mkString(",")}")
    if (validateKeys) {
      Seq("base" -> base, "updates" -> updates).foreach { case (side, df) =>
        // count(lit(1)).as("__cnt"), not .count(): a key column literally named
        // "count" would otherwise make the filter an ambiguous reference.
        val dup = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") > 1).limit(1).collect()
        require(dup.isEmpty,
          s"upsert requires unique keys per side; $side has duplicate key " +
            dup.head.toSeq.init.mkString("(", ",", ")"))
      }
    }
    val dataCols = base.columns.filterNot(keyCols.contains).toSeq
    val b = base.select(keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__b"): _*)
    val u = updates.select(keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__u"): _*)
    b.join(u, keyCols, "full_outer")
      .select(keyCols.map(col) ++ dataCols.map(c =>
        when(col("__u").isNotNull, col(s"__u.$c")).otherwise(col(s"__b.$c")).as(c)): _*)
  }

  /** Full CDC merge: [[upsert]] plus DELETES. `changes` carries the base
    * schema PLUS `opCol`; rows with op `"D"`/`"d"` remove their key from
    * the table, every other op value (including NULL — a feed that only
    * marks deletes) upserts whole-row. The op column never reaches the
    * result schema.
    *
    * Same uniqueness precondition as [[upsert]], now per CHANGE BATCH:
    * one row per key, so "delete then re-insert in one batch" is
    * ill-defined by construction rather than order-dependent (collapse
    * the feed to its last record per key first — the streaming sink
    * does exactly that by `seqCol`).
    *
    * Scale shape: the delete pass is one broadcast-able left-anti join on
    * the (typically tiny) delete key set; the remainder is [[upsert]]'s
    * single full-outer merge join. */
  def applyCdc(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op",
      validateKeys: Boolean = false): DataFrame = {
    require(changes.columns.contains(opCol),
      s"applyCdc: op column '$opCol' not in changes (${changes.columns.mkString(",")})")
    val dels = changes.filter(upper(col(opCol)) === "D")
      .select(keyCols.map(col): _*)
    val ups = changes.filter(upper(col(opCol)).isNull || upper(col(opCol)) =!= "D")
      .drop(opCol)
    upsert(base.join(dels, keyCols, "left_anti"), ups, keyCols, validateKeys)
  }

  /** Slowly-changing-dimension TYPE 2 merge: where [[upsert]]/[[applyCdc]]
    * overwrite history, this VERSIONS it. The dimension carries
    * `valid_from` / `valid_to` / `is_current` bookkeeping columns; each
    * change row (key + payload + its effective timestamp) closes the key's
    * current version (`valid_to` = effective, `is_current` = false) and
    * appends a new open version. Keys without a change pass through
    * untouched, closed history rows are never revisited, and brand-new
    * keys open their first version. Every change creates a version —
    * suppressing no-op payloads is the feed's concern (diff upstream),
    * not the merge's, which must stay deterministic under replays.
    *
    * `changes` must be unique per key (same precondition and rationale as
    * [[upsert]]; collapse a multi-event feed to last-per-key first). An
    * effective timestamp at or before the current version's `valid_from`
    * fails fast — it would write a zero-or-negative-length interval and
    * silently corrupt as-of lookups (the usual symptom of an unordered
    * feed replaying an old batch).
    *
    * Scale shape: history rows never shuffle (one union); only the
    * CURRENT slice joins the (small) change batch — the standard
    * current/history partition split makes that slice cheap to scan at
    * rest. As-of reads compose with [[graft.operators.Temporal]]'s as-of
    * join against (`valid_from`, `valid_to`) intervals. */
  def scd2Apply(
      dim: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      effectiveCol: String,
      validFrom: String = "valid_from",
      validTo: String = "valid_to",
      currentFlag: String = "is_current"): DataFrame = {
    val book = Seq(validFrom, validTo, currentFlag)
    book.foreach(c => require(dim.columns.contains(c),
      s"scd2Apply: dimension lacks bookkeeping column '$c'"))
    require(changes.columns.contains(effectiveCol),
      s"scd2Apply: changes lack effective-timestamp column '$effectiveCol'")
    val payload = dim.columns.filterNot((keyCols ++ book).contains).toSeq
    require(changes.columns.sorted.sameElements((keyCols ++ payload :+ effectiveCol).sorted),
      s"scd2Apply: changes must carry exactly key + payload + $effectiveCol; " +
        s"got ${changes.columns.sorted.mkString(",")}")
    // a NULL flag row would match NEITHER filter below and silently vanish
    // from the result — fail loudly instead, consistent with the rest of
    // this function's contract (a backfilled-as-NULL flag column is a real
    // upstream defect, not a row to drop)
    val checked = dim.withColumn(currentFlag,
      when(col(currentFlag).isNotNull, col(currentFlag))
        .otherwise(raise_error(concat(
          lit(s"scd2Apply: NULL $currentFlag for key ("),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
          lit(") — history rows must carry an explicit false")))))
    val hist = checked.filter(!col(currentFlag))
    val cur = checked.filter(col(currentFlag))
    // a NULL effective timestamp is unguardable downstream: after the left
    // join it is indistinguishable from "no change for this key", so the
    // current version would stay open while `opened` appended a SECOND
    // open version with NULL valid_from — fail on the change batch itself
    val effGuarded = when(col(effectiveCol).isNotNull, col(effectiveCol))
      .otherwise(raise_error(concat(
        lit("scd2Apply: NULL " + effectiveCol + " for key ("),
        concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
        lit(") — every change needs an effective timestamp"))))
    val eff = changes.select(
      (keyCols.map(col) :+ effGuarded.as("__eff")): _*)
    // close the matched current versions; guard interval sanity map-side
    val closed = cur.join(eff, keyCols, "left")
      .withColumn("__eff", when(col("__eff").isNull || col("__eff") > col(validFrom),
        col("__eff"))
        .otherwise(raise_error(concat(
          lit("scd2Apply: effective timestamp "), col("__eff").cast("string"),
          lit(" is not after the current version's " + validFrom + " "),
          col(validFrom).cast("string"),
          lit(" — out-of-order feed (replayed old batch?)")))))
      .select(
        (keyCols.map(col) ++ payload.map(col) :+ col(validFrom)) ++ Seq(
          coalesce(col("__eff"), col(validTo)).as(validTo),
          col("__eff").isNull.as(currentFlag)): _*)
    // open the new versions (covers brand-new keys too)
    // the same guard on the open side: a NULL-effective change for a NEW
    // key never reaches the closed join, so it must raise here
    val opened = changes.select(
      (keyCols.map(col) ++ payload.map(col)) ++ Seq(
        effGuarded.as(validFrom),
        lit(null).cast(dim.schema(validTo).dataType).as(validTo),
        lit(true).as(currentFlag)): _*)
    hist.select(dim.columns.map(col): _*)
      .unionByName(closed.select(dim.columns.map(col): _*))
      .unionByName(opened.select(dim.columns.map(col): _*))
  }
}
