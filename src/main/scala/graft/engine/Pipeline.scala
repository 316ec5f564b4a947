package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-table pipeline composition (SURVEY §3.3): the reference's ~15 eager
  * arcpy statements per feature class
  * (/root/reference/src/wins_transform_staging.py:143-273) become ONE lazy
  * Catalyst plan per output table — append, ordered field calculations,
  * blank normalization, join enrichment, QA split — with actions only at
  * the QA counts and sink writes.
  */
object Pipeline {

  /** One conditional assignment (R3+R4): set `field` to `value` where
    * `pred`; order matters — later rules see earlier rules' output. */
  final case class CalcRule(field: String, pred: Column, value: Column)

  /** J1/J2 enrichment config. */
  final case class Enrich(
      dim: DataFrame, leftKey: String, rightKey: String,
      rightOrder: Seq[Column], copies: Map[String, String])

  /** The two reference QA rules, parameterized (SURVEY §2.5). */
  final case class QaRules(
      dupKeys: Seq[String], dupReason: String,
      refDim: DataFrame, refLeftKey: String, refRightKey: String,
      refReason: String)

  /** As-executed physical layout of the staged frame — the straggler
    * predictor surfaced where users look (the run report): `skew` =
    * max/avg partition rows; 1.0 is perfectly balanced, 10 means the
    * slowest task did 10x the average work and the stage ran at its pace.
    * Derived from [[graft.operators.Profile.partitionStats]]. */
  final case class LayoutStats(
      nPartitions: Int, minRows: Long, maxRows: Long, avgRows: Double, skew: Double)

  /** What the reference logs per table (:253,263) plus the final counts
    * and the staged frame's partition-skew diagnostics (None only for an
    * empty input, which has no non-empty partitions to describe). */
  final case class RunReport(
      table: String, inputRows: Long, keptRows: Long,
      rejectsByReason: Map[String, Long],
      layout: Option[LayoutStats] = None)

  final case class TableResult(
      keep: DataFrame, rejects: DataFrame, report: RunReport,
      private val staged: Option[DataFrame] = None) {
    /** Release the QA input cached by [[runTable]] once keep/rejects have
      * been written to their sinks. */
    def unpersist(): Unit = staged.foreach(_.unpersist())
    /** Whether this result is holding a persisted frame that [[unpersist]]
      * must release. */
    def isCached: Boolean = staged.nonEmpty
  }

  /** Run the full §3.3 trace for one table. `template` fixes the output
    * schema (S5 — NO_TEST append into the template's column set).
    *
    * CACHE CONTRACT: the returned [[TableResult]] holds the enriched frame
    * persisted at `cache` (default MEMORY_AND_DISK) because three consumers
    * evaluate it; callers that use `runTable` directly MUST call
    * `TableResult.unpersist()` after writing keep/rejects, or route through
    * [[runAndPublish]], which releases it. Pass
    * `cache = StorageLevel.NONE` to opt out (each consumer then re-runs the
    * upstream plan). */
  def runTable(
      name: String,
      download: DataFrame,
      template: DataFrame,
      calcRules: Seq[CalcRule],
      blankToNullFields: Seq[String],
      enrich: Option[Enrich],
      qa: Option[QaRules],
      cache: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): TableResult = {

    // R1: land the download in the template schema
    val appended = Ops.appendNoTest(template, download)
    // R3+R4: ordered conditional calcs
    val calced = calcRules.foldLeft(appended) { (df, r) =>
      Ops.calcWhen(df, r.field, r.pred, r.value)
    }
    // R5: '' -> NULL
    val blanked = blankToNullFields.foldLeft(calced)(Ops.blankToNull)
    // J1/J2: first-match enrichment. The result is persisted (see the cache
    // contract in the scaladoc) because THREE consumers evaluate it: the
    // input count, the reject-count action, and the caller's keep/rejects
    // sink writes — without the cache the whole upstream
    // (scan+append+calcs+join) executes once per consumer. Single
    // evaluation is pinned by a PipelineSpec accumulator test.
    val cached = cache != org.apache.spark.storage.StorageLevel.NONE
    val joined = enrich.fold(blanked) { e =>
      Ops.joinEnrich(blanked, e.dim, e.leftKey, e.rightKey, e.rightOrder, e.copies)
    }
    val enriched = if (cached) joined.persist(cache) else joined
    // Q1..Q3: sequential split + routed rejects
    val result = qa match {
      case Some(q) =>
        val seed = enriched.limit(0).withColumn(Qa.FlagCol, lit(""))
        Qa.runRules(enriched, seed, Seq(
          df => Qa.dupSplit(df, q.dupKeys, q.dupReason),
          df => Qa.refSplit(df, q.refDim, q.refLeftKey, q.refRightKey, q.refReason)))
      case None =>
        Qa.QaSplit(enriched, enriched.limit(0).withColumn(Qa.FlagCol, lit("")))
    }
    // A2-style forced counts — the engine's only actions besides sinks.
    // append/calc/blank/enrich are all row-preserving (first-match join
    // never multiplies), so aggregating the PERSISTED frame both
    // materializes the cache and yields the input count in one pass;
    // keep/rejects partition the input (QaSpec property), so keptRows is
    // derived instead of recomputing the whole plan a third time. The
    // aggregation is per-PARTITION counts (|partitions| rows, collected),
    // so the same single pass also yields the as-executed layout/skew
    // diagnostics for the report — no extra scan.
    val pstats = graft.operators.Profile.partitionStats(enriched)
      .collect().map(_.getLong(1))
    val inputRows = pstats.sum
    val layout =
      if (pstats.isEmpty) None
      else {
        val avg = pstats.sum.toDouble / pstats.length
        def r2(x: Double) = math.round(x * 100) / 100.0
        Some(LayoutStats(pstats.length, pstats.min, pstats.max, r2(avg),
          r2(pstats.max / avg)))
      }
    val rejectCounts = result.rejects.groupBy(Qa.FlagCol).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val report = RunReport(name, inputRows, inputRows - rejectCounts.values.sum,
      rejectCounts, layout)
    TableResult(result.keep, result.rejects, report,
      staged = if (cached) Some(enriched) else None)
  }

  /** Run many tables and publish keeps + one merged reject table atomically
    * (S8). The merged reject schema is the UNION of all reject schemas
    * (missing columns null-filled) — appendNoTest would project onto the
    * first table's columns and silently drop later tables' payloads. */
  def runAndPublish(
      tables: Seq[(String, TableResult)], stagingDir: String): Seq[RunReport] = {
    // both collisions below would otherwise SILENTLY drop a table's keep
    // output (Map overwrite): duplicate names collapse to one entry, and
    // "rejects" is claimed by the merged reject frame
    val names = tables.map(_._1)
    val dups = names.diff(names.distinct).distinct
    require(dups.isEmpty, s"runAndPublish: duplicate table names: ${dups.mkString(", ")}")
    require(!names.contains("rejects"),
      "runAndPublish: 'rejects' is reserved for the merged reject table")
    val keeps = tables.map { case (n, t) => n -> t.keep }.toMap
    val rejects = tables.map(_._2.rejects)
      .reduceLeft((a, b) => a.unionByName(b, allowMissingColumns = true))
    try Sinks.publish(keeps + ("rejects" -> rejects), stagingDir)
    finally tables.foreach(_._2.unpersist()) // release runTable's QA caches
    tables.map(_._2.report)
  }
}
