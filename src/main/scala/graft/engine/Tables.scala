package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source connectors (SURVEY §2.1 S2/S6).
  *
  * The reference ingests feature classes by server-side FGDB export + download
  * (/root/reference/src/wins_transform_staging.py:118-135) and snapshots an SDE
  * (Oracle) view locally before joining (:55-58,174). Here both become columnar
  * Parquet scans: Catalyst pushes predicates and prunes columns into the scan,
  * which is the 100 TB-scale replacement for the reference's manual local
  * snapshot + attribute indexes (:156-161).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** S2: scan one fixture table. `dir` is an sf directory like
    * /root/testdata/sf0.01.
    *
    * `events.ts` is TIMESTAMP(NANOS) in Parquet, which Spark 4 rejects
    * outright (PARQUET_TYPE_ILLEGAL); `nanosAsLong` reads it as epoch-nanos
    * int64 instead, and [[loadEvents]] converts to a µs TimestampType the
    * same way DuckDB does (truncation), so oracle comparisons line up.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Session-level by necessity (the flag is consulted at scan execution,
    // so a set-and-restore around the read would break the later action),
    // but scoped to the one table that needs it: reading any OTHER fixture
    // table never flips it. NOTE the flag is a one-way latch: once events
    // has been loaded it stays set for the session, so a LATER direct read
    // of an external nanos-typed parquet silently gets long columns instead
    // of PARQUET_TYPE_ILLEGAL — load-order dependent, unavoidable short of
    // a per-read flag Spark doesn't offer; the flag only affects
    // nanos-typed columns, which no other fixture table has.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** `events` with `ts` as a proper µs TimestampType column. */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
}
