package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Ops, Qa, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * A compressed run of the reference pipeline (SURVEY §3.3) on the fixture
    * star schema: enrich orders from the customer dimension (J1), run both QA
    * rules (Q1+Q2) with reject routing, and report row counts per disposition
    * — the analog of the reference's logged counts
    * (/root/reference/src/wins_transform_staging.py:253,263).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    val enriched = Ops.joinEnrich(
      orders, customer, "o_custkey", "c_custkey",
      rightOrder = Seq(col("c_custkey")), copies = Map("descr" -> "c_name"))
    val seed = enriched.limit(0).withColumn(Qa.FlagCol, lit(""))
    val dim = customer.filter(col("c_acctbal") > 0)
    val qa = Qa.runRules(enriched, seed, Seq(
      df => Qa.dupSplit(df, Seq("o_custkey", "o_orderpriority"), "duplicate order tag"),
      df => Qa.refSplit(df, dim, "o_custkey", "c_custkey", "custkey not found in dim")))
    qa.keep.select(lit("keep").as("disposition")).groupBy("disposition").count()
      .unionByName(
        qa.rejects.groupBy(col(Qa.FlagCol).as("disposition")).count())
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.6
    * training-data extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ ExtQueries.all ++ ScaleQueries.all ++ AuditQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles ++ ExtQueries.oracles ++ ScaleQueries.oracles ++ AuditQueries.oracles
}
