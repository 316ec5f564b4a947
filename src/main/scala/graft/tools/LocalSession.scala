package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE local session configuration every entrypoint (Bench, Verify,
  * Smoke, Plans) builds from. Round 8's bench-timezone bug was exactly the
  * drift this prevents: the UTC line existed in three mains and not the
  * fourth, so bench numbers silently came from a differently-configured
  * engine than verify results. Add session confs HERE, never in one main.
  *
  * UTC is load-bearing, not cosmetic: `Tables.loadEvents` casts the
  * fixture's TIMESTAMP_NTZ event times through the session timezone, and
  * the DuckDB oracles assume UTC semantics.
  */
object LocalSession {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
