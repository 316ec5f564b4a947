package graft.engine

import org.apache.spark.sql.DataFrame

/** Sinks / publish (SURVEY §2.1 S4/S7/S8).
  *
  * The reference deletes-then-recreates every output (`Exists` +
  * `Delete_management`, wins_transform_staging.py:137-140,241-242) and
  * publishes by copying the whole upload gdb over the staging gdb
  * (:280-286). Spark's overwrite mode subsumes the manual delete; "publish"
  * is an overwrite into the staging directory — at cluster scale a
  * write-to-tmp + atomic rename, here the Hadoop committer already gives
  * task-level atomicity.
  */
object Sinks {

  /** S4/S7 — idempotent materialize. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S8 — staged publish of a set of named tables into a staging dir. */
  def publish(tables: Map[String, DataFrame], stagingDir: String): Unit =
    tables.foreach { case (name, df) => write(df, s"$stagingDir/$name") }
}
