package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QA / reject routing — the reference's signature compound operator
  * (SURVEY §2.5; /root/reference/src/wins_transform_staging.py:236-273).
  *
  * Each rule splits a table into (keep, rejects) and stamps the rejects with
  * a reason column. The reference applies rules sequentially — rule 2 only
  * sees rows that survived rule 1 (:255 deletes before :258 selects), and its
  * `REJECT_FLAG IS null` guard (:268) keeps rule-1 reasons from being
  * overwritten in the accumulated reject table. Tagging each reject batch
  * with its reason at split time reproduces both behaviors (SURVEY §7.3).
  */
object Qa {

  /** A disjoint partition of an input: keep ∪ rejects = input,
    * keep ∩ rejects = ∅ (property-tested in QaSpec). */
  final case class QaSplit(keep: DataFrame, rejects: DataFrame)

  val FlagCol = "REJECT_FLAG"

  /** Q1 — duplicate-key split (:240-257). The reference joins back to a
    * materialized Frequency table and selects FREQUENCY > 1 (J3); a window
    * count over the key is the same semantics with one shuffle and no
    * materialized intermediate.
    */
  def dupSplit(df: DataFrame, keys: Seq[String], reason: String): QaSplit = {
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
    val tagged = df.withColumn("__freq", count(lit(1)).over(w))
    QaSplit(
      keep = tagged.filter(col("__freq") === 1).drop("__freq"),
      rejects = tagged.filter(col("__freq") > 1).drop("__freq")
        .withColumn(FlagCol, lit(reason)))
  }

  /** Q2 — referential-integrity split (:258-269): rows whose key has no match
    * in the dimension are rejected (left_anti); survivors are the left_semi.
    * The dimension side is deduplicated and pruned to the key column so the
    * build side stays small (broadcast-able even when the dim table is wide).
    * NULL keys match nothing (`=` semantics, matching ArcGIS and DuckDB —
    * SURVEY §7.3).
    */
  def refSplit(
      df: DataFrame,
      dim: DataFrame,
      leftKey: String,
      rightKey: String,
      reason: String,
      broadcastDim: Boolean = true): QaSplit = {
    val keys0 = dim.select(col(rightKey)).distinct()
    val keys = if (broadcastDim) broadcast(keys0) else keys0
    val cond = df(leftKey) === keys(rightKey)
    QaSplit(
      keep = df.join(keys, cond, "left_semi"),
      rejects = df.join(keys, cond, "left_anti").withColumn(FlagCol, lit(reason)))
  }

  /** Q3 — reject routing (:254-256,264-269): accumulate a reject batch into
    * the running reject table. The reject table's schema is the base schema +
    * REJECT_FLAG; NO_TEST append semantics reconcile any column drift.
    */
  def route(rejectTable: DataFrame, batch: DataFrame): DataFrame =
    Ops.appendNoTest(rejectTable, batch)

  /** Apply an ordered list of QA rules sequentially (rule N+1 sees only
    * rule N's keep side), returning the final keep and the accumulated
    * rejects. `rejectSchema` seeds the reject table (the reference
    * instantiates it from a template gdb, :147-148).
    */
  def runRules(
      df: DataFrame,
      rejectSeed: DataFrame,
      rules: Seq[DataFrame => QaSplit]): QaSplit =
    rules.foldLeft(QaSplit(df, rejectSeed)) { (acc, rule) =>
      val s = rule(acc.keep)
      QaSplit(s.keep, route(acc.rejects, s.rejects))
    }
}
