package graft
object Bench {
  /** Lower-median: robust to one GC/JIT outlier, and for even sample counts
    * picks a time that actually occurred rather than an average of two. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Repeats per query (median reported): single-shot timing on a shared
    // local JVM swings 3-4x on sub-second queries with JIT/GC ordering, which
    // made round-over-round comparison meaningless. 3 back-to-back runs per
    // query cost ~3x wall but make per-query deltas adjudicable.
    val repeats = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt)
    // Hard wall-clock budget for the whole suite. The driver kills the bench
    // at its own timeout (round 7 died at rc=124 with zero numbers — worse
    // than degraded numbers); once the budget is spent, remaining queries run
    // a single sample and extensions stop, so the suite ALWAYS emits JSON.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "1800").toDouble
    val suiteT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - suiteT0) / 1e9
    val spark = graft.tools.LocalSession.build(cpus)
    // Warm up the session (codegen, parquet footer reads, executor pool)
    // so the first measured query doesn't absorb ~5s of JVM startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
    // Optional args = subset of query names (local iteration); driver
    // invokes with no args = full suite.
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} (a typo would otherwise bench an empty suite)")
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.contains).toMap
    // deterministic (sorted) execution order: per-query times are
    // comparable round over round instead of depending on Map hashing
    // adaptive extension is rationed suite-wide: round 7's run extended on
    // nearly every query (the spread check included the cold first sample,
    // which legitimately runs 3-4x slow from JIT/codegen) and blew past the
    // driver timeout. Two fixes: (a) the cold first sample is EXCLUDED from
    // the spread computation — only disagreement among warm samples signals
    // host interference; (b) extras are capped across the whole suite.
    var extrasLeft = 40
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = Seq.newBuilder[Double]
      // a failed query must surface as an error, not masquerade as a fast
      // time: record the exception per query and keep the run going
      var err: Option[String] = None
      var i = 0
      // adaptive extension: a transiently loaded host can inflate single
      // samples 10-70x (observed 0.8s vs 57.8s back-to-back, and bursts
      // spanning several consecutive queries). If the WARM samples (cold
      // first sample excluded) disagree by >3x after the base repeats, take
      // up to 4 extra samples: with a multi-sample interference burst, 2
      // extras still left the lower-median inflated (sorted
      // [3.0,3.4,9.9,16.1,44.8] reports 9.9 for a ~3s query); 4 extras let
      // the clean samples reclaim the median once the burst ends.
      def spreadTooWide(ts: Seq[Double]): Boolean = {
        val warm = ts.drop(1)
        warm.size >= 2 && warm.max / math.max(warm.min, 1e-9) > 3.0
      }
      def maxRuns(ts: Seq[Double]): Int = {
        if (elapsedSec > budgetSec) 1 // budget gone: one sample, move on
        else if (spreadTooWide(ts)) repeats + math.min(4, extrasLeft)
        else repeats
      }
      while (i < maxRuns(times.result()) && err.isEmpty) {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        times += (System.nanoTime() - t0) / 1e9
        // OUTSIDE the timed window: drop blocks the run left behind
        // (localCheckpoint RDDs from resolveClusters/pipeline staging, cached
        // tables). They otherwise linger until the JVM GCs the RDD object and
        // ContextCleaner catches up, so later runs pay the previous run's
        // storage debt — measured: pipeline_docs back-to-back samples went
        // 4.5s → 9.3s → 9.3s without this, and round 6's single-shot "+66%
        // regression" was this same pollution from the queries before it.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        i += 1
      }
      extrasLeft -= math.max(0, i - repeats)
      (name, times.result(), err)
    }
    val qs = results.map { case (k, ts, _) => s"\"" + k + "\":" + median(ts) }
      .mkString("{", ",", "}")
    val samples = results.map { case (k, ts, _) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m)) =>
      s"${JsonStr.quote(k)}:${JsonStr.quote(m)}"
    }.mkString("{", ",", "}")
    val total = results.map { case (_, ts, _) => median(ts) }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"repeats":$repeats,"samples":$samples,"errors":$errs,"budget_exceeded":${elapsedSec > budgetSec},"sf":"$sfDir"}"""
    // Stop Spark BEFORE emitting: its shutdown logs otherwise land after the
    // JSON line, and every driver-side BENCH_r*.json through round 8 came
    // back `parsed: null` because the line rode sbt's [info] prefix inside a
    // noisy log. Belt and braces: also persist the line to known files so
    // the driver/judge can read it without scraping stdout at all.
    spark.stop()
    val outPaths = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"),
      "/tmp/bench.json")
    outPaths.distinct.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () } // an unwritable path must not kill the run
    }
    println(json)
    System.out.flush()
  }
}
