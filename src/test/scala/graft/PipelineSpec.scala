package graft

import org.apache.spark.sql.functions._
import graft.engine.{Pipeline, Qa, Sinks}
import graft.engine.Pipeline.{CalcRule, Enrich, QaRules}

/** End-to-end golden test mirroring the reference trace for
  * RESERVES_AND_RESTRICTIONS (SURVEY §3.3; FIXTURES.md §B edge rows):
  * every required edge case rides through one pipeline run. */
class PipelineSpec extends SparkSpec {
  import sqlContext.implicits._

  // FIXTURES §B: tags '' vs populated; RV%/RS%/neither; duplicate TRRR_TAG
  // group; tags with 0, 1, 2+ POD matches; a row hit by both QA rules.
  private def download = Seq(
    ("RV01", "appended", "none"),  // RV rule, 1 POD match
    ("RS02", "appended", "none"),  // RS rule, 2 POD matches (first-match)
    ("XX03", "appended", "none"),  // no calc rule, 1 POD match
    ("DUP4", "appended", "none"),  // duplicate pair -> rule 1...
    ("DUP4", "appended", "none"),  //   ...both rows rejected
    ("MISS", "appended", "none"),  // 1 POD match? no -> rule 2 reject
    ("", "appended", "none")       // blank -> NULL -> no POD match -> rule 2
  ).toDF("TRRR_TAG", "FEATURE_CODE", "extra_col")

  private def template =
    Seq.empty[(String, String, String)].toDF("TRRR_TAG", "FEATURE_CODE", "DESCRIPTION")

  private def pod = Seq(
    ("RV01", "rv descr", 1), ("RS02", "rs descr A", 2), ("RS02", "rs descr B", 3),
    ("XX03", "xx descr", 4), ("DUP4", "dup descr", 5), ("UNUSED", "no tag", 6)
  ).toDF("PNTS_CODE", "PNTS_DESCR", "OID")

  private def run() = Pipeline.runTable(
    name = "RESERVES_AND_RESTRICTIONS",
    download = download,
    template = template,
    calcRules = Seq(
      CalcRule("FEATURE_CODE", col("TRRR_TAG").like("RV%"), lit("EA83030000")),
      CalcRule("FEATURE_CODE", col("TRRR_TAG").like("RS%"), lit("EA83040000"))),
    blankToNullFields = Seq("TRRR_TAG"),
    enrich = Some(Enrich(pod, "TRRR_TAG", "PNTS_CODE", Seq(col("OID")),
      Map("DESCRIPTION" -> "PNTS_DESCR"))),
    qa = Some(QaRules(
      Seq("TRRR_TAG"), "Duplicate TRRR_TAG",
      pod, "TRRR_TAG", "PNTS_CODE", "TRRR_TAG not found in Water POD Table")))

  test("e2e golden: counts, calc rules, first-match enrichment, QA routing") {
    val r = run()
    assert(r.report.inputRows == 7)
    assert(r.report.keptRows == 3) // RV01, RS02, XX03
    assert(r.report.rejectsByReason == Map(
      "Duplicate TRRR_TAG" -> 2,
      "TRRR_TAG not found in Water POD Table" -> 2)) // MISS + blank->NULL

    val keep = r.keep.select("TRRR_TAG", "FEATURE_CODE", "DESCRIPTION")
      .collect().map(x => (x.getString(0), x.getString(1), x.getString(2))).toSet
    assert(keep == Set(
      ("RV01", "EA83030000", "rv descr"),
      ("RS02", "EA83040000", "rs descr A"), // first match by OID, row never multiplied
      ("XX03", "appended", "xx descr")))    // untouched by calc rules
    // extra_col dropped by NO_TEST append; template schema + flag on rejects
    assert(r.keep.columns.toSeq == Seq("TRRR_TAG", "FEATURE_CODE", "DESCRIPTION"))
    assert(r.rejects.columns.contains(Qa.FlagCol))
    // dup rows rejected by rule 1 carry rule 1's reason even though DUP4
    // also has a POD match state (reason precedence, reference :268)
    val dupReasons = r.rejects.filter(col("TRRR_TAG") === "DUP4")
      .select(Qa.FlagCol).as[String].collect().toSet
    assert(dupReasons == Set("Duplicate TRRR_TAG"))
  }

  test("runTable: the report carries as-executed layout stats (straggler predictor where users look)") {
    val r = run()
    val ls = r.report.layout.getOrElse(fail("layout stats missing from the run report"))
    assert(ls.nPartitions > 0)
    assert(ls.minRows >= 1 && ls.minRows <= ls.maxRows) // non-empty partitions only
    // the layout describes exactly the counted input: rows distribute over
    // partitions, and skew is max over average (>= 1 by construction)
    assert(ls.nPartitions * ls.maxRows >= r.report.inputRows)
    assert(ls.skew >= 1.0)
    assert(math.abs(ls.avgRows * ls.nPartitions - r.report.inputRows) < 0.01 * ls.nPartitions + 1e-9)
    r.unpersist()

    // empty input: no non-empty partitions to describe -> None, loudly typed
    val empty = Pipeline.runTable(
      name = "empty", download = template, template = template,
      calcRules = Nil, blankToNullFields = Nil, enrich = None, qa = None,
      cache = org.apache.spark.storage.StorageLevel.NONE)
    assert(empty.report.inputRows == 0 && empty.report.layout.isEmpty)
  }

  test("runTable: the QA input is evaluated once across counts and both sink reads (persisted split)") {
    val acc = spark.sparkContext.longAccumulator("source-evals")
    // the fence (asNondeterministic) stops Catalyst duplicating the tick
    // into each downstream reference; with the persist in runTable the
    // column is then evaluated exactly once per source row regardless of
    // how many consumers read the split
    val tick = udf { (s: String) => acc.add(1L); s }.asNondeterministic()
    val r = Pipeline.runTable(
      name = "tick",
      download = download.withColumn("TRRR_TAG", tick(col("TRRR_TAG"))),
      template = template,
      calcRules = Seq(CalcRule("FEATURE_CODE", col("TRRR_TAG").like("RV%"), lit("X"))),
      blankToNullFields = Seq("TRRR_TAG"),
      enrich = Some(Enrich(pod, "TRRR_TAG", "PNTS_CODE", Seq(col("OID")),
        Map("DESCRIPTION" -> "PNTS_DESCR"))),
      qa = Some(QaRules(
        Seq("TRRR_TAG"), "dup", pod, "TRRR_TAG", "PNTS_CODE", "ref")))
    r.keep.count()    // sink read 1
    r.rejects.count() // sink read 2
    assert(acc.value == 7) // one evaluation per source row, total — not 3x
    r.unpersist()
  }

  test("runTable: cache = NONE opts out of the persist (no pinned entry to leak)") {
    val r = Pipeline.runTable(
      name = "uncached", download = download, template = template,
      calcRules = Nil, blankToNullFields = Nil, enrich = None, qa = None,
      cache = org.apache.spark.storage.StorageLevel.NONE)
    assert(r.keep.count() == 7)
    assert(!r.isCached) // nothing persisted, unpersist() is a no-op
    r.unpersist()
  }

  test("runAndPublish: merged reject table keeps the UNION of all reject schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft-staging2").toString + "/staged"
    val r1 = Pipeline.TableResult(
      Seq("a1").toDF("TRRR_TAG"),
      Seq(("a1", "colA", "dup")).toDF("TRRR_TAG", "only_in_t1", Qa.FlagCol),
      Pipeline.RunReport("t1", 2, 1, Map("dup" -> 1)))
    val r2 = Pipeline.TableResult(
      Seq("b1").toDF("TNTH_TAG"),
      Seq(("b1", "colB", "ref")).toDF("TNTH_TAG", "only_in_t2", Qa.FlagCol),
      Pipeline.RunReport("t2", 2, 1, Map("ref" -> 1)))
    Pipeline.runAndPublish(Seq("t1" -> r1, "t2" -> r2), dir)
    val rejects = spark.read.parquet(s"$dir/rejects")
    assert(rejects.columns.toSet ==
      Set("TRRR_TAG", "only_in_t1", Qa.FlagCol, "TNTH_TAG", "only_in_t2"))
    assert(rejects.count() == 2) // neither table's payload dropped
  }

  test("publish: atomic staging swap; failed run leaves previous staging intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-staging").toString + "/staged"
    val r = run()
    Pipeline.runAndPublish(Seq("RRR" -> r), dir)
    val published = spark.read.parquet(s"$dir/RRR")
    assert(published.count() == 3)
    assert(spark.read.parquet(s"$dir/rejects").count() == 4)

    // second publish with a poisoned table: staging must keep version 1
    val boom = udf { (s: String) =>
      if (s != null) throw new RuntimeException("decode failure"); s
    }
    val poisoned = r.keep.withColumn("TRRR_TAG", boom(col("TRRR_TAG")))
    intercept[Exception] {
      Sinks.publish(Map("RRR" -> poisoned), dir)
    }
    assert(spark.read.parquet(s"$dir/RRR").count() == 3) // old version intact
  }
}
