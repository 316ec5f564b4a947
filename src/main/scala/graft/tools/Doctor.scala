package graft.tools

import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.operators.{Events, Profile, TextAnalysis}

/** Corpus doctor: one command, one health report — the operator library
  * packaged as the check a user runs before trusting a fixture directory
  * (and, with a second directory, before trusting an upgrade of it).
  *
  * `runMain graft.tools.Doctor <sfDir> [refDir]`
  *
  * Single-dir sections: the one-row dataset card, language-composition
  * entropy per source, Zipf rank-frequency fit, per-table as-executed
  * partition skew, and the events seasonality peak. With `refDir`, the
  * drift battery runs against it: PSI + KS on document lengths,
  * categorical PSI on the language mix, per-source length quantile drift,
  * and the row-level snapshot diff tally. Every number comes from the
  * SAME registered operators the driver verifies against DuckDB — the
  * doctor adds packaging, not new arithmetic. */
object Doctor {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Doctor <sfDir> [refDir]")
    val dir = args(0)
    val refDir = args.lift(1)
    val spark = LocalSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("ERROR")
    def section(title: String): Unit = println(s"\n===== $title =====")

    val docs = Tables.load(spark, dir, "documents")

    section(s"dataset card ($dir)")
    Profile.datasetCard(docs, "doc_id", "text", "lang", "source")
      .show(truncate = false)

    section("language composition per source (entropy/evenness)")
    Profile.groupEntropy(docs, "source", "lang").orderBy("source")
      .show(50, truncate = false)

    section("Zipf rank-frequency fit (natural text ~ -1)")
    TextAnalysis.zipfSlope(docs, "text").show(truncate = false)

    section("as-executed partition skew per table")
    Seq("documents", "events", "orders", "lineitem").foreach { t =>
      val rep = Profile.skewReport(Tables.load(spark, dir, t))
        .withColumn("table", lit(t))
      rep.select("table", "n_partitions", "min_rows", "max_rows", "avg_rows", "skew")
        .show(truncate = false)
    }

    section("events seasonality: top traffic cells")
    Events.seasonalityProfile(Tables.loadEvents(spark, dir), "ts")
      .orderBy(col("n").desc).limit(5).show(truncate = false)

    section("duplication shape: near-dup cluster-size histogram (ngram jaccard >= 0.5)")
    // the REGISTERED query, not a re-implementation — the doctor's header
    // contract is packaging over DuckDB-verified arithmetic
    graft.SparkEntry.queries("dedup_cluster_sizes")(spark, dir)
      .show(truncate = false)

    section("ingest-order zone map: would a time cutoff prune? (event_id zones)")
    val ev = Tables.loadEvents(spark, dir)
    val zoneRows = Profile.zoneMap(ev,
        floor(col("event_id") / 2000).cast("long"), "ts")
      .orderBy("zone").collect()
    val span = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    zoneRows.take(10).foreach(r => println(s"[doctor]   $r"))
    println(s"[doctor] ts span ${span.get(0)} .. ${span.get(1)} over " +
      s"${zoneRows.length} zones — tight per-zone ranges mean time predicates " +
      "prune on statistics (Sinks.writeZoneMapped / Sources.readZonePruned)")

    refDir.foreach { ref =>
      val refDocs = Tables.load(spark, ref, "documents")
      section(s"drift vs $ref: document length PSI (>0.25 = retrain-worthy)")
      Profile.psiDrift(refDocs, docs, "n_chars")
        .agg(round(sum(col("psi_term")), 4).as("psi")).show()
      section("drift: document length KS (max cumulative gap)")
      Profile.ksDrift(refDocs, docs, "n_chars")
        .agg(max(col("ks_term")).as("ks")).show()
      section("drift: language mix (categorical PSI terms)")
      Profile.psiDriftCategorical(refDocs, docs, "lang").orderBy("lang")
        .show(50, truncate = false)
      section("drift: per-source length quantiles")
      Profile.quantileDrift(refDocs, docs, "source", "n_chars", Seq(0.5, 0.95))
        .orderBy("source").show(50, truncate = false)
      section("row-level snapshot diff")
      graft.operators.Curation.snapshotDiff(refDocs, docs, "doc_id", Seq("text"))
        .groupBy("status").count().orderBy("status").show(truncate = false)
    }

    spark.stop()
  }
}
