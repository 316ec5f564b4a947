package graft.operators

import org.apache.spark.sql.DataFrame
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
    * any orderable key type gets identical hashing. The sketch itself is
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
    val cms = keyed.stat.countMinSketch("__k", eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val bcast = df.sparkSession.sparkContext.broadcast(cms)
    val est = udf((k: String) => bcast.value.estimateCount(k))
    heavyHitters(df, keyCol, minCount)
      .withColumn("__est", est(col(keyCol).cast("string")))
      .select(col(keyCol), col("cnt"),
        when(col("__est") >= col("cnt") && col("__est") <= col("cnt") + slack, 1)
          .otherwise(0).as("cms_ok"))
  }
}
