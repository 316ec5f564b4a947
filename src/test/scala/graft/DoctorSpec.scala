package graft

import org.apache.spark.sql.functions._
import graft.tools.Doctor

/** Pins the Doctor report's testable core: each section's (title, frame)
  * row shape, the zone section's pruning claim on time-ordered ingest,
  * the zone-size parameterization, the empty-events diagnostic, and the
  * no-drift identity of the drift battery run against its own input. */
class DoctorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ sections

  test("sections: seven uniquely-titled frames with pinned schemas") {
    val secs = Doctor.sections(spark, dir)
    assert(secs.size == 7)
    assert(secs.map(_._1).distinct.size == 7, "section titles must be unique")
    val schemas = secs.map(_._2.columns.toSeq)
    assert(schemas(0) == Seq("n_docs", "n_null_text", "n_tokens", "n_langs",
      "n_sources", "p50_len", "p95_len", "n_dup_groups", "n_dup_docs",
      "dup_rate"), "dataset card")
    assert(schemas(1) == Seq("source", "n", "n_cats", "entropy", "evenness"),
      "language composition")
    assert(schemas(2) == Seq("n_terms", "slope", "intercept", "r2"),
      "Zipf fit")
    assert(schemas(3) == Seq("table", "n_partitions", "min_rows", "max_rows",
      "avg_rows", "skew"), "partition skew")
    assert(schemas(4) == Seq("dow", "hod", "n", "share"), "seasonality")
    assert(schemas(5) == Seq("cluster_size", "n_clusters", "n_docs"),
      "cluster-size histogram")
    assert(schemas(6) == Seq("zone", "n_rows", "v_min", "v_max", "skippable"),
      "zone audit")
  }

  test("sections: every frame collects non-empty; card is one row; skew covers the four tables") {
    val rows = Doctor.sections(spark, dir).map { case (t, df) => t -> df.collect() }
    rows.foreach { case (t, rs) => assert(rs.nonEmpty, s"section '$t' is empty") }
    assert(rows(0)._2.length == 1, "dataset card is a one-row summary")
    assert(rows(3)._2.map(_.getAs[String]("table")).sorted.toSeq ==
      Seq("documents", "events", "lineitem", "orders"))
    assert(rows(4)._2.length <= 5, "seasonality section is capped at 5 cells")
  }

  // ----------------------------------------------------- zonePruningAudit

  test("zonePruningAudit: median-time predicate prunes some but not all zones on time-ordered ingest") {
    // sf0.001 has 1000 events — the default 2000-row zones collapse to one
    // zone there, so the pruning claim needs the finer granularity the
    // parameter exists for (10 zones; ingest order correlates with ts)
    val audit = Doctor.zonePruningAudit(spark, dir, zoneSize = 100L).collect()
    assert(audit.nonEmpty)
    val skippable = audit.count(_.getAs[Int]("skippable") == 1)
    assert(skippable > 0,
      "time-ordered ingest must yield skippable zones at the median cutoff")
    assert(skippable < audit.length,
      "zones holding the upper half can never be skippable for ts >= p50")
  }

  test("zonePruningAudit: zoneSize parameterizes the zone granularity") {
    val coarse = Doctor.zonePruningAudit(spark, dir, zoneSize = 2000L).count()
    val fine = Doctor.zonePruningAudit(spark, dir, zoneSize = 500L).count()
    assert(fine > coarse, s"quartering zoneSize must multiply zones ($coarse -> $fine)")
    val e = intercept[IllegalArgumentException] {
      Doctor.zonePruningAudit(spark, dir, zoneSize = 0L)
    }
    assert(e.getMessage.contains("zoneSize"))
  }

  test("zonePruningAudit fails with the named diagnostic when events has no non-NULL ts") {
    val tmp = java.nio.file.Files.createTempDirectory("doctor-empty").toString
    graft.engine.Tables.loadEvents(spark, dir).limit(0)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Doctor.zonePruningAudit(spark, tmp)
    }
    assert(e.getMessage.contains("no non-NULL ts"))
  }

  // ------------------------------------------------------- driftSections

  test("driftSections: five titled frames with pinned schemas") {
    val secs = Doctor.driftSections(spark, dir, dir)
    assert(secs.size == 5)
    val schemas = secs.map(_._2.columns.toSeq)
    assert(schemas(0) == Seq("psi"))
    assert(schemas(1) == Seq("ks"))
    assert(schemas(2) == Seq("lang", "p_ref", "p_cmp", "psi_term"))
    assert(schemas(3) == Seq("source", "p50_ref", "p95_ref", "p50_cmp",
      "p95_cmp", "d_p50", "d_p95"))
    assert(schemas(4) == Seq("status", "count"))
  }

  test("driftSections vs the same directory: the no-drift identity") {
    val secs = Doctor.driftSections(spark, dir, dir).toMap
    val byIdx = Doctor.driftSections(spark, dir, dir)
    assert(byIdx(0)._2.head.getAs[Double]("psi") == 0.0)
    assert(byIdx(1)._2.head.getAs[Double]("ks") == 0.0)
    assert(byIdx(2)._2.collect().forall(_.getAs[Double]("psi_term") == 0.0),
      "identical language mixes have zero PSI terms")
    val qd = byIdx(3)._2.collect()
    assert(qd.forall(r => r.getAs[Double]("d_p50") == 0.0 &&
      r.getAs[Double]("d_p95") == 0.0))
    val diff = byIdx(4)._2.collect()
    assert(diff.length == 1 && diff.head.getAs[String]("status") == "unchanged",
      "a snapshot diffed against itself is all-unchanged")
    assert(secs.size == 5) // toMap dedup check: titles unique
  }

  test("indexSection: the stored IVF+PQ health dashboard rides the doctor contract; verdict covers every branch") {
    import org.apache.spark.sql.functions.col
    val emb = graft.engine.Tables.load(spark, dir, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("graft-doc-idx").toString
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      graft.operators.Similarity.writeIvfPqIndex(emb, "vec_id",
        "embedding", idx, nLists = 4, lloydIters = 1, m = 8, ksub = 16,
        pqIters = 1)
      val secs = Doctor.indexSection(spark, idx)
      assert(secs.size == 1 && secs.head._1.contains(idx))
      val h = secs.head._2.head()
      assert(h.getAs[Long]("total_indexed") == emb.count())
      assert(Doctor.indexVerdict(h).startsWith("OK"))
    } finally fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    // verdict branches, pinned on constructed rows (pure function)
    val schema = org.apache.spark.sql.types.StructType(
      Seq("total_indexed", "base_rows", "delta_rows", "n_lists",
        "cells_used", "empty_cells", "min_pop", "max_pop").map(n =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.LongType)) ++ Seq(
        org.apache.spark.sql.types.StructField("imbalance",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("bad_codes",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bad_codebook",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("tombstone_rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("dead_rows",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bad_rotation",
          org.apache.spark.sql.types.LongType)))
    def row(total: Long, delta: Long, imb: Double, bad: Long,
        badCb: Long, dead: Long = 0L, badRot: Long = 0L) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](total, total - delta, delta, 16L, 16L, 0L, 1L, total,
          imb, bad, badCb, dead, dead, badRot), schema)
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 0, 0)).startsWith("OK"))
    assert(Doctor.indexVerdict(row(100, 30, 1.2, 0, 0)).startsWith("COMPACT"))
    assert(Doctor.indexVerdict(row(100, 0, 5.0, 0, 0)).startsWith("RETRAIN"))
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 3, 0)).startsWith("CORRUPT"))
    // codebook corruption outranks everything else in the row
    assert(Doctor.indexVerdict(row(100, 90, 9.0, 5, 1)).contains("codebooks"))
    // an empty index is servable-as-is (nothing to compact or retrain)
    assert(Doctor.indexVerdict(row(0, 0, Double.NaN, 0, 0)).startsWith("OK"))
    // a heavily tombstoned index compacts (dead rows still cost probes)
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 0, 0, dead = 30L))
      .contains("tombstoned"))
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 0, 0, dead = 10L))
      .startsWith("OK"))
    // a bad OPQ rotation is CORRUPT (codes are meaningless without it),
    // outranked only by the codebook audit
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 0, 0, badRot = 1L))
      .contains("rotation"))
    assert(Doctor.indexVerdict(row(100, 0, 1.2, 0, 1, badRot = 1L))
      .contains("codebooks"))
  }

  test("benchmarkSections: survey + plan shapes; a planted leak surfaces in both and flips the verdict") {
    import sqlContext.implicits._
    // benchmark = a real fixture doc's text — the corpus provably overlaps
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val benchText = docs.filter(col("text").isNotNull &&
      length(col("text")) >= 100).select("text").head().getString(0)
    val benchDir = java.nio.file.Files.createTempDirectory("doctor-bench").toString
    Seq((900001L, benchText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(benchDir)
    val secs = Doctor.benchmarkSections(spark, dir, benchDir)
    assert(secs.map(_._1).distinct.size == 2)
    val survey = secs.head._2.head()
    assert(survey.schema.fieldNames.toSeq == Seq(
      "n_docs", "n_c10", "n_c50", "n_c90", "mean_contamination"))
    val plan = secs.last._2.head()
    assert(plan.schema.fieldNames.toSeq == Seq(
      "n_docs", "docs_touched", "chars_removed", "docs_gated_out"))
    assert(plan.getAs[Long]("n_docs") == docs.count())
    // the source doc of the benchmark text IS a full-coverage leak: it
    // strips to nothing and gates out
    assert(plan.getAs[Long]("docs_touched") >= 1L)
    assert(plan.getAs[Long]("chars_removed") >= benchText.length.toLong)
    assert(plan.getAs[Long]("docs_gated_out") >= 1L)
    assert(Doctor.benchmarkVerdict(plan).startsWith("DECONTAMINATE"))
    // a benchmark column-shape violation is loud
    val badDir = java.nio.file.Files.createTempDirectory("doctor-bad").toString
    Seq((1L, "x")).toDF("id", "body").write.mode("overwrite").parquet(badDir)
    val e = intercept[IllegalArgumentException](
      Doctor.benchmarkSections(spark, dir, badDir))
    assert(e.getMessage.contains("doc_id"))
  }

  test("benchmarkVerdict: every branch pinned") {
    def row(n: Long, touched: Long, gated: Long) =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](n, touched, touched, gated),
        org.apache.spark.sql.types.StructType(Seq(
          "n_docs", "docs_touched", "chars_removed", "docs_gated_out").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType))))
    assert(Doctor.benchmarkVerdict(row(0, 0, 0)).startsWith("EMPTY"))
    assert(Doctor.benchmarkVerdict(row(1000, 0, 0)) == "OK: no span overlap with the benchmark")
    // gated docs dominate: even one is a whole-document leak
    assert(Doctor.benchmarkVerdict(row(1000, 5, 1)).startsWith("DECONTAMINATE"))
    assert(Doctor.benchmarkVerdict(row(1000, 5, 1)).contains("substantially"))
    // >1% touched without gating still says run the stage
    assert(Doctor.benchmarkVerdict(row(1000, 11, 0)).startsWith("DECONTAMINATE"))
    assert(Doctor.benchmarkVerdict(row(1000, 11, 0)).contains("share spans"))
    // a trickle is background boilerplate
    assert(Doctor.benchmarkVerdict(row(1000, 10, 0)).startsWith("OK"))
    assert(Doctor.benchmarkVerdict(row(1000, 10, 0)).contains("trace"))
  }
}
