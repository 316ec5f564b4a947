package graft
import scala.jdk.CollectionConverters._
object Bench {
  /** Lower-median: robust to one GC/JIT outlier, and for even sample counts
    * picks a time that actually occurred rather than an average of two. */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s((s.size - 1) / 2)
  }

  /** warm-min: fastest sample EXCLUDING the cold first one (JIT/codegen make
    * it legitimately 3-4x slow); with a single sample it is that sample. A
    * warm run the query actually achieved is the best available lower bound
    * on its true cost — interference only ever inflates, never deflates. */
  private[graft] def warmMin(ts: Seq[Double]): Double =
    if (ts.size <= 1) ts.headOption.getOrElse(Double.NaN) else ts.drop(1).min

  /** TRUE when the sample vector proves host interference, i.e. the visit
    * must be requeued. Two independent signals, either suffices:
    *
    *  (a) `median > 2 × warm-min` — at least one warm sample ran at least
    *      2× faster than the reported median, so the median was provably
    *      inflated at least once (the burst ended mid-visit);
    *  (b) `warm-min > 2 × cold` — every warm sample ran at least 2× slower
    *      than the COLD sample, which pays JIT + codegen and is the
    *      slowest honest run by construction; warm-slower-than-cold means
    *      the burst started AFTER the cold sample and spanned every warm
    *      one, leaving median ≈ warm-min so signal (a) is blind to it
    *      (round-12 evidence: `tfidf_topterms` sampled [1.93, 11.50,
    *      19.25] — median/warm-min = 1.0, never requeued, shipped 11.5 s
    *      for a 0.85 s query; seven keys, ~26 s phantom cost).
    *
    * Honest queries have cold ≥ warm ≈ median and trip neither; a requeue
    * reports the LOWER-median visit, so this can only remove phantom cost,
    * never understate real cost. Single-sample vectors never flag (no warm
    * evidence either way). */
  private[graft] def interfered(ts: Seq[Double]): Boolean = {
    if (ts.size <= 1) false
    else {
      val wm = warmMin(ts)
      median(ts) / math.max(wm, 1e-9) > 2.0 || wm > 2.0 * ts.head
    }
  }

  /** Per-key medians of the previous round's committed full-suite history,
    * parsed from its JSON line's `"queries":{...}` object. The bench's own
    * output format — flat `"key":number` pairs — so a regex walk suffices
    * (no JSON library in the unmanaged classpath). Any parse trouble
    * degrades to empty (drift detection silently off, exactly the pre-r18
    * behavior) rather than failing the bench. */
  private[graft] def parsePrevMedians(
      json: String, sfDir: String): Map[String, Double] = {
    // the history is only a drift reference for the SAME scale factor:
    // a local sf0.01 subset run must not be judged against committed
    // sf0.1 medians (observed: a 3x phantom "drift" from exactly that)
    val sfm = java.util.regex.Pattern
      .compile("\"sf\":\"([^\"]*)\"").matcher(json)
    if (!sfm.find() || sfm.group(1) != sfDir) return Map.empty
    val qm = java.util.regex.Pattern
      .compile("\"queries\":\\{([^}]*)\\}").matcher(json)
    if (!qm.find()) Map.empty
    else {
      val pairs = java.util.regex.Pattern
        .compile("\"([A-Za-z0-9_]+)\":([-+0-9.eE]+)").matcher(qm.group(1))
      val b = Map.newBuilder[String, Double]
      while (pairs.find())
        try b += pairs.group(1) -> pairs.group(2).toDouble
        catch { case _: NumberFormatException => () }
      b.result()
    }
  }

  /** Cross-round drift ratio for one key: reported median over the
    * previous round's committed median, when the key existed then.
    * Round 17 proved the within-run triggers ([[interfered]]) are blind
    * to a burst spanning EVERY sample of a visit — three keys sat
    * consistently at 2-4x their committed history with `noisy: []` —
    * so the history the repo already carries is the missing signal:
    * a key whose median exceeds 1.5x its previous-round median gets the
    * same end-of-suite requeue as an interference flag, and keys still
    * above the bar after adjudication are listed under `"drift"` in the
    * output for the round-over-round comparison to adjudicate (genuine
    * regression vs slow box — a slow BOX drifts broadly, a slow COMMIT
    * drifts on the keys it touched). */
  private[graft] def driftRatio(
      prev: Map[String, Double], name: String, med: Double): Option[Double] =
    prev.get(name).collect {
      case p if p > 1e-9 && med / p > 1.5 =>
        math.round(med / p * 100.0) / 100.0
    }

  /** Round-numbered files matching `pattern` (one capture group = the
    * round) in cwd — ONE implementation of the round inference, shared
    * by the drift-baseline lookup and the end-of-run history stamp so
    * the two can never disagree about which round is which. */
  private def listRounds(pattern: String): Seq[(Int, java.nio.file.Path)] = {
    val pat = java.util.regex.Pattern.compile(pattern)
    val listing = java.nio.file.Files.list(java.nio.file.Paths.get("."))
    try listing.iterator().asScala
      .map(p => (p, pat.matcher(p.getFileName.toString)))
      .collect { case (p, m) if m.matches() => (m.group(1).toInt, p) }
      .toSeq
    finally listing.close() // Files.list holds a directory fd until closed
  }

  /** Which visit to report for a flagged key, and whether the key stays
    * suspect. The requeue visit is accepted only if its OWN sample vector
    * is PROVABLY clean — at least two samples (a single sample carries no
    * warm evidence, so `interfered` is vacuously false on it; treating
    * that as proof would let a lone budget-exhausted rerun taken inside
    * the same burst both replace the visit and clear the flag) and clean
    * under both [[interfered]] triggers — AND it improved the median: a
    * rerun that is itself interfered proves nothing about the query's
    * true cost, and blindly taking the lower median of two dirty visits
    * biases honest-but-noisy keys downward (a query whose warm samples
    * honestly degrade — heap/GC pressure in the long-lived bench JVM —
    * or whose cold sample drafted on a predecessor's page-cached input
    * trips a trigger without any host burst). Returns (samples to
    * report, noisy): `noisy` is true when the original visit was flagged
    * and no provably-clean rerun exists — the reported median is the
    * best available but round-over-round comparison should discount
    * it. */
  private[graft] def adjudicateRerun(
      orig: Seq[Double], rerun: Option[Seq[Double]]): (Seq[Double], Boolean) = {
    def provablyClean(ts: Seq[Double]) = ts.size >= 2 && !interfered(ts)
    val best = rerun match {
      case Some(ts2) if provablyClean(ts2) && median(ts2) < median(orig) => ts2
      case _ => orig
    }
    val noisy = interfered(orig) && !rerun.exists(provablyClean)
    (best, noisy)
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
    // Per-query shuffle-volume meter (graft.tools.ShuffleMeter): shuffle
    // bytes are a property of the PLAN + data, not the host — the
    // scale-relevant number the timings can't give: a query that got
    // faster by shuffling less shows it here, and one whose time
    // regressed under host noise shows UNCHANGED bytes.
    val meter = new graft.tools.ShuffleMeter(spark)
    // Warm up the session (codegen, parquet footer reads, executor pool)
    // so the first measured query doesn't absorb ~5s of JVM startup.
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()
    // PREVIOUS round's committed per-key medians — the cross-round drift
    // reference; empty when missing or run outside the repo root (drift
    // detection off, nothing else changes). The previous round is
    // max(BENCH_r*.json) — the driver stamps those AFTER each round, so
    // at run time the newest is last round's. "Latest BENCH_FULL" would
    // be WRONG: this round's own first full run writes BENCH_FULL_r{N},
    // and a second run (the clean-rerun adjudication protocol) would then
    // judge itself against run 1's possibly-inflated numbers instead of
    // the committed history — masking exactly the episode it adjudicates.
    val prevMedians: Map[String, Double] = try {
      val driverRounds = listRounds("BENCH_r(\\d+)\\.json").map(_._1)
      val fulls = listRounds("BENCH_FULL_r(\\d+)\\.json")
      if (driverRounds.isEmpty || fulls.isEmpty) Map.empty[String, Double]
      else {
        val prevRound = driverRounds.max
        // newest committed history at or before the previous round
        val eligible = fulls.filter(_._1 <= prevRound)
        if (eligible.isEmpty) Map.empty[String, Double]
        else parsePrevMedians(new String(
          java.nio.file.Files.readAllBytes(eligible.maxBy(_._1)._2),
          java.nio.charset.StandardCharsets.UTF_8), sfDir)
      }
    } catch { case _: Throwable => Map.empty[String, Double] }
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
    // Execute the query's OWN physical plan and drain it — NOT
    // `df.count()`: planning a fresh count() lets Catalyst collapse the
    // declared plan (an outer join against a grouped aggregate whose
    // columns a count never reads is ELIMINATED — substring_floor_recall
    // benched 0.23s/341 shuffle bytes for a job whose real plan winnows
    // the whole planted corpus). toRdd runs the already-planned query
    // exactly as a sink would see it; counting the RDD moves no rows to
    // the driver.
    def runPlan(df: org.apache.spark.sql.DataFrame): Unit = {
      df.queryExecution.toRdd.count(): Unit
    }
    // Runs one query n times back-to-back; returns (samples, firstError).
    // Cleanup between samples happens OUTSIDE the timed window: drop blocks
    // the run left behind (localCheckpoint RDDs from resolveClusters/pipeline
    // staging, cached tables). They otherwise linger until the JVM GCs the
    // RDD object and ContextCleaner catches up, so later runs pay the
    // previous run's storage debt — measured: pipeline_docs back-to-back
    // samples went 4.5s → 9.3s → 9.3s without this, and round 6's
    // single-shot "+66% regression" was this same pollution.
    def sample(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame,
               maxRuns: Seq[Double] => Int): (Seq[Double], Option[String], Long) = {
      val times = Seq.newBuilder[Double]
      var err: Option[String] = None
      // shuffle volume is plan+data determined — one measurement (the
      // first sample) per query; the bus drain adds ~ms to the cold
      // sample, which the warm-min/median treatment already discounts
      var shuffle = -1L
      var i = 0
      while (i < maxRuns(times.result()) && err.isEmpty) {
        val t0 = System.nanoTime()
        try {
          if (i == 0) shuffle = meter.measure(() => runPlan(fn(spark, sfDir)))
          else runPlan(fn(spark, sfDir))
        } catch {
          case e: Throwable =>
            err = Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
        times += (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        i += 1
      }
      (times.result(), err, shuffle)
    }
    val firstPass = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
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
      val (ts, err, shuffle) = sample(fn, maxRuns)
      extrasLeft -= math.max(0, ts.size - repeats)
      (name, ts, err, shuffle)
    }
    // Burst-immunity second chance: extension helps only if the burst ends
    // within the extra samples; a burst spanning the whole visit leaves the
    // median 2-4x inflated (round-9 driver run: dedup_exact 2.42s vs 0.64s
    // isolated). [[interfered]] flags both burst shapes (median ≫ warm-min,
    // and warm-min ≫ cold for bursts starting after the cold sample) —
    // requeue flagged queries for ONE fresh visit at END of suite (minutes
    // later, burst long over); [[adjudicateRerun]] decides whether that
    // visit replaces the original (only a provably-clean, lower-median
    // rerun does) or the key ships its original median marked `noisy`.
    // Honest slow queries trip neither signal, so this cannot understate
    // real cost.
    // Two requeue triggers: within-run interference evidence, and (r18)
    // cross-round drift >1.5x vs the committed previous-round median —
    // round 17's burst spanned every sample of several visits, leaving
    // median == warm-min and the variance triggers blind while the keys
    // sat at 2-4x their history. Drift-only requeues are capped (worst
    // ratios first): on a uniformly slow box EVERYTHING drifts, and
    // requeueing the whole suite would double its wall clock for reruns
    // taken inside the same slowdown.
    val interferedKeys = firstPass.collect {
      case (name, ts, None, _) if interfered(ts) => name
    }
    val driftRequeue = firstPass.collect {
        case (name, ts, None, _) if !interfered(ts) =>
          (name, driftRatio(prevMedians, name, median(ts)))
      }.collect { case (n, Some(r)) => (n, r) }
      .sortBy(-_._2).take(12).map(_._1)
    val flagged = interferedKeys ++ driftRequeue
    val rerunByName: Map[String, Seq[Double]] =
      flagged.flatMap { name =>
        if (elapsedSec > budgetSec) None
        else {
          val (ts, err, _) =
            sample(selected(name), _ => if (elapsedSec > budgetSec) 1 else repeats)
          if (err.isEmpty && ts.nonEmpty) Some(name -> ts) else None
        }
      }.toMap
    val results = firstPass.map { case (name, ts, err, shuffle) =>
      val rerun = rerunByName.get(name)
      val (best, noisy) = adjudicateRerun(ts, rerun)
      (name, ts, rerun, best, err, shuffle, noisy)
    }
    val qs = results.map { case (k, _, _, best, _, _, _) => s"\"" + k + "\":" + median(best) }
      .mkString("{", ",", "}")
    val warmMins = results.map { case (k, ts, rerun, _, _, _, _) =>
      val all = ts ++ rerun.getOrElse(Nil)
      s"\"" + k + "\":" + warmMin(all)
    }.mkString("{", ",", "}")
    val samples = results.map { case (k, ts, rerun, _, _, _, _) =>
      val all = ts ++ rerun.getOrElse(Nil)
      s"\"" + k + "\":" + all.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val reruns = results.collect { case (k, _, Some(_), _, _, _, _) => JsonStr.quote(k) }
      .mkString("[", ",", "]")
    // keys whose every visit tripped an interference trigger: their
    // reported median is the best available but still suspect — the
    // round-over-round comparison should discount them
    val noisyKeys = results.collect { case (k, _, _, _, _, _, true) => JsonStr.quote(k) }
      .mkString("[", ",", "]")
    val errs = results.collect { case (k, _, _, _, Some(m), _, _) =>
      s"${JsonStr.quote(k)}:${JsonStr.quote(m)}"
    }.mkString("{", ",", "}")
    // keys whose FINAL reported median still exceeds 1.5x the committed
    // previous-round median (ratio attached): the round-over-round signal
    // the within-run detectors cannot see. Broad drift = slow box;
    // drift localized to touched code = a real regression to bisect.
    val driftOut = results.collect {
      case (k, _, _, best, None, _, _) =>
        (k, driftRatio(prevMedians, k, median(best)))
    }.collect { case (k, Some(r)) => s"${JsonStr.quote(k)}:$r" }
      .mkString("{", ",", "}")
    val shuffles = results.collect { case (k, _, _, _, None, sh, _) if sh >= 0 =>
      s"\"" + k + "\":" + (sh / 1048576.0 * 100).round / 100.0
    }.mkString("{", ",", "}")
    val total = results.map { case (_, _, _, best, _, _, _) => median(best) }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warm_min":$warmMins,"shuffle_mb":$shuffles,"repeats":$repeats,"samples":$samples,"reruns":$reruns,"noisy":$noisyKeys,"drift":$driftOut,"errors":$errs,"budget_exceeded":${elapsedSec > budgetSec},"sf":"$sfDir"}"""
    // Stop Spark BEFORE emitting: its shutdown logs otherwise land after the
    // JSON line, and every driver-side BENCH_r*.json through round 8 came
    // back `parsed: null` because the line rode sbt's [info] prefix inside a
    // noisy log. Belt and braces: also persist the line to known files so
    // the driver/judge can read it without scraping stdout at all.
    spark.stop()
    // Round-stamped FULL history (per-key medians, warm-mins, raw samples,
    // shuffle bytes) committed into the repo: the driver's BENCH_r{N}.json
    // keeps only a 2000-char tail, which made round-over-round per-key
    // comparison impossible for ~85% of keys from the repo alone. The round
    // number is inferred as max(existing BENCH_r*.json) + 1 — the driver
    // writes BENCH_r{N}.json only AFTER this run, so at run time the newest
    // stamped file is the PREVIOUS round's. FULL-suite runs only: a local
    // subset iteration must not clobber the round's history file.
    val roundStamped: Option[String] = if (args.nonEmpty) None else try {
      val rounds = listRounds("BENCH_r(\\d+)\\.json").map(_._1)
      if (rounds.isEmpty) {
        // a silent None here skips the committed BENCH_FULL history the
        // round protocol depends on — make the skip visible at run time
        // (full-suite run launched outside the repo root, or a first-ever
        // round) instead of at the next round's comparison
        System.err.println(
          "[bench] WARNING: no BENCH_r*.json in cwd " +
            s"(${java.nio.file.Paths.get(".").toAbsolutePath.normalize}) — " +
            "skipping the round-stamped BENCH_FULL history file; run the " +
            "full suite from the repo root to keep per-key history")
        None
      }
      else Some(f"BENCH_FULL_r${rounds.max + 1}%02d.json")
    } catch { case e: Throwable =>
      System.err.println(
        s"[bench] WARNING: round-history inference failed (${e.getClass.getSimpleName}: " +
          s"${e.getMessage}) — skipping the round-stamped BENCH_FULL history file")
      None
    }
    val outPaths = Seq(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json"),
      "/tmp/bench.json") ++ roundStamped
    outPaths.distinct.foreach { p =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => () } // an unwritable path must not kill the run
    }
    println(json)
    System.out.flush()
  }
}
