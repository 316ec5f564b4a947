package graft.engine

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan fan-out for CPU-heavy map kernels (optimization
  * guide §2.5 "input skew" / §6 input-split sizing).
  *
  * Spark parallelizes a parquet scan by BYTE ranges, and a file with a
  * single row group is one indivisible split no matter the conf — the
  * whole scan runs as ONE task. That is the right call when per-byte work
  * is cheap (an exchange would cost more than the scan), but the text
  * kernels this engine runs over document corpora (per-k-gram md5
  * winnowing, positional gram explodes, per-row strip expressions) do
  * orders of magnitude more CPU per byte than a scan: profiled at sf0.1,
  * every exact-substring key spent 2-4 SEQUENTIAL single-task stages of
  * 1-5 s each hashing ~1.6 MB of text on one core of 32 while the other
  * 31 sat idle.
  *
  * [[out]] round-robin-repartitions the frame to the session default
  * parallelism — but ONLY when the optimizer's size estimate says the
  * input could not already fill the cluster at the configured split size
  * (`size < defaultParallelism × spark.sql.files.maxPartitionBytes`). At
  * production scale a corpus scan arrives in thousands of splits, the
  * guard fails, and this is the identity — no shuffle is ever added to a
  * scan that is already parallel. Both knobs scale with the session
  * (cores, split size), nothing is tuned to local[32].
  *
  * Results are unaffected by construction: callers are exact-integer /
  * byte-exact kernels (md5 hex selections, gram counts, span strips)
  * whose downstream aggregations are layout-independent, and round-robin
  * repartition is deterministic (Spark sorts before assigning —
  * SPARK-23207). Do NOT reach for this in front of floating-point
  * aggregations: partial-merge order there is layout-dependent and the
  * single-split plan is what keeps those bit-stable.
  */
object Fan {
  def out(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    if (par <= 1) return df
    val bytes =
      try df.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case scala.util.control.NonFatal(_) => return df }
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes < BigInt(maxSplit) * par) df.repartition(par) else df
  }
}
