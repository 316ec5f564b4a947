package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Events, Profile, Similarity, TextAnalysis}

/** Round-10 audit/analytics operators: KS drift, Benford, Pareto frontier,
  * Markov transitions, CUSUM changepoints, weighted sampling, embedding
  * covariance, asymmetric containment. */
class AuditOpsSpec extends SparkSpec {
  import sqlContext.implicits._

  // -------------------------------------------------------------- ksDrift

  test("ksDrift: identical snapshots give ks_term 0 in every bin") {
    val a = (1 to 100).map(_.toDouble).toDF("x")
    val rows = Profile.ksDrift(a, a, "x", nBins = 10).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Double]("ks_term") == 0.0))
  }

  test("ksDrift: a disjoint shift is detected at full strength (clamped edge bin)") {
    val ref = (1 to 100).map(_.toDouble).toDF("x")
    val cmp = (1001 to 1100).map(_.toDouble).toDF("x") // beyond ref range
    val rows = Profile.ksDrift(ref, cmp, "x", nBins = 10)
      .orderBy("bin").collect()
    // all cmp mass clamps into the LAST ref bin: at bin 8 ref has
    // accumulated everything below bin 9 (90 of 100 values: bin 9 opens at
    // x = 90.1) while cmp is still 0 — the gap is exactly 0.9, and both
    // CDFs only close at the final bin
    val maxKs = rows.map(_.getAs[Double]("ks_term")).max
    assert(maxKs == 0.9)
    // and the final bin closes both CDFs at 1.0
    val last = rows.last
    assert(last.getAs[Double]("cum_p_ref") == 1.0)
    assert(last.getAs[Double]("cum_p_cmp") == 1.0)
  }

  test("ksDrift: half-shifted sample yields the known midpoint gap") {
    // ref uniform on bins 0..9; cmp only in the upper half => KS = 0.5 at
    // the midpoint (ref CDF 0.5, cmp CDF 0)
    val ref = (0 until 100).map(i => i / 10 + 0.5).toDF("x") // 10 per bin
    val cmp = (0 until 50).map(i => 5 + i / 10 + 0.4).toDF("x")
    val maxKs = Profile.ksDrift(ref, cmp, "x", nBins = 10)
      .agg(max("ks_term")).as[Double].head()
    assert(maxKs == 0.5)
  }

  test("ksDrift fails loudly on an all-NULL reference") {
    val ref = Seq[java.lang.Double](null, null).toDF("x")
    val cmp = Seq(1.0, 2.0).toDF("x")
    val e = intercept[Exception] {
      Profile.ksDrift(ref, cmp, "x").collect()
    }
    assert(e.getMessage.contains("no non-NULL"))
  }

  // --------------------------------------------------------- benfordAudit

  test("benfordAudit: digits computed arithmetically across magnitudes; absences appear as n=0") {
    val df = Seq(1.0, 19.5, 250.0, 0.034, 3.7e6, 9.99, 0.1).toDF("x")
    // leading digits: 1, 1, 2, 3, 3, 9, 1
    val got = Profile.benfordAudit(df, "x").orderBy("digit")
      .select("digit", "n").as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 3L, 2 -> 1L, 3 -> 2L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L))
  }

  test("benfordAudit: non-positive and NULL values excluded but tallied") {
    val df = Seq[java.lang.Double](5.0, 0.0, -3.0, null, 55.0).toDF("x")
    val rows = Profile.benfordAudit(df, "x").collect()
    assert(rows.forall(_.getAs[Long]("n_excluded") == 3L))
    assert(rows.map(_.getAs[Long]("n")).sum == 2L)
    // p_obs shares computed over the VALID population only
    val d5 = rows.find(_.getAs[Int]("digit") == 5).get
    assert(d5.getAs[Double]("p_obs") == 1.0)
  }

  test("benfordAudit: p_benford follows log10(1 + 1/d) and sums to ~1") {
    val df = Seq(1.0).toDF("x")
    val ps = Profile.benfordAudit(df, "x")
      .orderBy("digit").select("p_benford").as[Double].collect()
    assert(math.abs(ps(0) - 0.30103) < 1e-5) // log10(2)
    assert(math.abs(ps.sum - 1.0) < 1e-4)
  }

  // ------------------------------------------------------- paretoFrontier

  test("paretoFrontier: hand-computed skyline, dominated staircase rows flagged 0") {
    // (x=size maximize, y=price minimize); per-x best y:
    //  x=1 -> 1.0, x=2 -> 3.0 (dominated: x=3 has y 2.0), x=3 -> 2.0,
    //  x=5 -> 4.0 (frontier: largest x)
    val df = Seq((1, 1.0), (1, 9.0), (2, 3.0), (3, 2.0), (3, 8.0), (5, 4.0))
      .toDF("sz", "price")
    val rows = Profile.paretoFrontier(df, "sz", "price")
      .orderBy("x").collect()
    val flags = rows.map(r => r.getAs[Int]("x") -> r.getAs[Int]("on_frontier")).toMap
    assert(flags == Map(1 -> 1, 2 -> 0, 3 -> 1, 5 -> 1))
    val best = rows.map(r => r.getAs[Int]("x") -> r.getAs[Double]("best_y")).toMap
    assert(best == Map(1 -> 1.0, 2 -> 3.0, 3 -> 2.0, 5 -> 4.0))
    val counts = rows.map(r => r.getAs[Int]("x") -> r.getAs[Long]("n_at_x")).toMap
    assert(counts == Map(1 -> 2L, 2 -> 1L, 3 -> 2L, 5 -> 1L))
  }

  test("paretoFrontier: equal best_y at smaller x is dominated (strict undercut required)") {
    val df = Seq((1, 2.0), (2, 2.0)).toDF("sz", "price")
    val flags = Profile.paretoFrontier(df, "sz", "price")
      .collect().map(r => r.getAs[Int]("x") -> r.getAs[Int]("on_frontier")).toMap
    // x=2 frontier; x=1 offers the same price at smaller size => dominated
    assert(flags == Map(1 -> 0, 2 -> 1))
  }

  test("paretoFrontier excludes NULL coordinates") {
    val df = Seq[(Integer, java.lang.Double)]((1, 1.0), (null, 0.1), (2, null))
      .toDF("sz", "price")
    val rows = Profile.paretoFrontier(df, "sz", "price").collect()
    assert(rows.length == 1 && rows.head.getAs[Int]("x") == 1)
  }

  // ----------------------------------------------------- transitionMatrix

  test("transitionMatrix: counts and conditional probabilities, last event emits no pair") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), // a->b, b->a
      (2L, 1L, "a"), (2L, 2L, "b"),                // a->b
      (3L, 1L, "a")                                // no successor
    ).toDF("uid", "seq", "et").withColumn("ts", timestamp_seconds(col("seq")))
      .withColumn("eid", col("seq"))
    val rows = Events.transitionMatrix(df, "uid", "ts", "et", "eid").collect()
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(byPair == Map(("a", "b") -> (2L, 1.0), ("b", "a") -> (1L, 1.0)))
  }

  test("transitionMatrix: same-timestamp events order deterministically by id") {
    val df = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 10L, 3L, "c"))
      .toDF("uid", "sec", "eid", "et")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val pairs = Events.transitionMatrix(df, "uid", "ts", "et", "eid")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b"), ("b", "c")))
  }

  test("transitionMatrix: per-from probabilities sum to 1") {
    val ev = engine.Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val sums = Events.transitionMatrix(ev, "user_id", "ts", "event_type", "event_id")
      .groupBy("from_type").agg(sum("p").as("s")).select("s").as[Double].collect()
    assert(sums.nonEmpty && sums.forall(s => math.abs(s - 1.0) < 1e-3))
  }

  // ---------------------------------------------------- cusumChangepoint

  test("cusumChangepoint: level shift peaks at the change, cusum closes near 0") {
    // 4 days at 2 events/day then 4 days at 6: mean 4, cusum walks down to
    // -8 at day 4 (the changepoint) and back to 0
    val events = (for {
      day <- 0 until 8
      i <- 0 until (if (day < 4) 2 else 6)
    } yield (day.toLong * 86400 + i, 1L)).toDF("sec", "uid")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val rows = Events.cusumChangepoint(events, "ts", "day")
      .orderBy("period").collect()
    assert(rows.length == 8)
    val cusums = rows.map(_.getAs[Double]("cusum"))
    assert(cusums.last == 0.0)
    assert(cusums.min == -8.0)
    val peaks = rows.filter(_.getAs[Int]("is_peak") == 1)
      .map(_.getAs[Double]("cusum")).toSeq
    assert(peaks == Seq(-8.0))
  }

  test("cusumChangepoint: stationary counts keep every |cusum| at 0 and all rows peak-tied") {
    val events = (for { day <- 0 until 3; i <- 0 until 5 }
      yield (day.toLong * 86400 + i, 1L)).toDF("sec", "uid")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val rows = Events.cusumChangepoint(events, "ts", "day").collect()
    assert(rows.forall(_.getAs[Double]("cusum") == 0.0))
    assert(rows.forall(_.getAs[Int]("is_peak") == 1)) // ties all flag
  }

  // --------------------------------------- sampleWeightedPerStratum

  test("sampleWeightedPerStratum: k per stratum, stable under row order, matches the formula") {
    val docs = engine.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val got = Curation.sampleWeightedPerStratum(docs, "doc_id", "lang", "n_chars", k = 5)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    // stable under a different physical row order
    val reordered = Curation.sampleWeightedPerStratum(
      docs.orderBy(col("n_chars").desc), "doc_id", "lang", "n_chars", k = 5)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    assert(got == reordered)
    // matches an independent Scala computation of the same ES draw
    val all = docs.select("doc_id", "lang", "n_chars")
      .as[(Long, String, Long)].collect()
    def score(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|wsample".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
      -math.log(u) / w
    }
    val expected = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (score(r._1, r._3), r._1)).take(5).toSeq
    }.map(r => (r._1, r._2)).toSet
    assert(got == expected)
    // k per stratum exactly (every fixture stratum has >= 5 docs)
    val perStratum = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 5))
  }

  test("sampleWeightedPerStratum is weight-proportional in aggregate") {
    // two interleaved weight classes: heavy rows 100x the weight of light
    // ones; the sampled set must be overwhelmingly heavy (deterministic
    // draw — this asserts the realized sample, no flakiness)
    val df = (1 to 400).map(i => (i.toLong, "s", if (i % 2 == 0) 10000L else 100L))
      .toDF("id", "g", "w")
    val picked = Curation.sampleWeightedPerStratum(df, "id", "g", "w", k = 40)
      .select("w").as[Long].collect()
    val heavy = picked.count(_ == 10000L)
    assert(heavy >= 35, s"expected >=35/40 heavy draws, got $heavy")
  }

  test("sampleWeightedPerStratum excludes NULL-id rows (no NULL-score top-k hijack)") {
    val df = Seq[(java.lang.Long, String, Long)](
      (1L, "s", 5L), (2L, "s", 5L), (null, "s", 5L))
      .toDF("id", "g", "w")
    val got = Curation.sampleWeightedPerStratum(df, "id", "g", "w", k = 2)
      .select("id").as[Long].collect().toSet
    // a NULL id would sort FIRST on its NULL score and displace a real
    // draw; the contract excludes it instead
    assert(got == Set(1L, 2L))
  }

  test("sampleWeightedPerStratum fails loudly on NULL/zero/negative weights") {
    val df = Seq[(Long, String, java.lang.Long)]((1L, "s", 5L), (2L, "s", 0L))
      .toDF("id", "g", "w")
    val e = intercept[Exception] {
      Curation.sampleWeightedPerStratum(df, "id", "g", "w", k = 2).collect()
    }
    assert(e.getMessage.contains("non-positive"))
  }

  // ----------------------------------------------------- covarianceMatrix

  test("covarianceMatrix matches hand-computed population covariance") {
    // vectors (1,2), (3,4), (5,0): means (3,2)
    // var x = (4+0+4)/3, cov xy = ((-2*0)+(0*2)+(2*-2))/3, var y = (0+4+4)/3
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f), Seq(5.0f, 0.0f)).toDF("v")
    val got = Similarity.covarianceMatrix(df, "v", 2)
      .orderBy("i", "j").select("cov").as[Double].collect()
    assert(got.length == 3)
    assert(math.abs(got(0) - 8.0 / 3) < 1e-6)  // c_0_0
    assert(math.abs(got(1) - (-4.0 / 3)) < 1e-6) // c_0_1
    assert(math.abs(got(2) - 8.0 / 3) < 1e-6)  // c_1_1
  }

  test("covarianceMatrix fails loudly on a short or NULL vector") {
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f)).toDF("v")
    val e = intercept[Exception] {
      Similarity.covarianceMatrix(df, "v", 2).collect()
    }
    assert(e.getMessage.contains("covarianceMatrix"))
  }

  test("covarianceMatrix emits the full upper triangle for k dims") {
    val df = Seq(Seq.fill(4)(1.0f), Seq.fill(4)(2.0f)).toDF("v")
    val rows = Similarity.covarianceMatrix(df, "v", 4).collect()
    assert(rows.length == 10) // 4*5/2
    assert(rows.forall(r => r.getAs[Int]("i") <= r.getAs[Int]("j")))
  }

  // ------------------------------------------------- zoneMap / skip audit

  test("zoneSkipAudit: clustered layout prunes, stats are exact, NULL-stat zones scan") {
    val df = Seq[(Long, java.lang.Double)](
      (0L, 1.0), (1L, 2.0), (2L, 3.0),   // zone 0: max 3
      (10L, 11.0), (11L, 12.0),          // zone 1: max 12
      (20L, null), (21L, null)           // zone 2: all-NULL stats
    ).toDF("id", "v")
    val rows = Profile.zoneSkipAudit(df, floor(col("id") / 10).cast("long"),
        "v", lit(10.0)).orderBy("zone").collect()
    assert(rows.length == 3)
    val z0 = rows(0)
    assert(z0.getAs[Long]("n_rows") == 3 && z0.getAs[Double]("v_max") == 3.0
      && z0.getAs[Int]("skippable") == 1)
    assert(rows(1).getAs[Int]("skippable") == 0) // max 12 straddles
    // all-NULL stats: conservative, scan
    assert(rows(2).isNullAt(rows(2).fieldIndex("v_max"))
      && rows(2).getAs[Int]("skippable") == 0)
  }

  test("zoneSkipAudit on the ingest-ordered fixture actually prunes most zones") {
    val ev = engine.Tables.loadEvents(spark, "/root/testdata/sf0.01")
    val rows = Profile.zoneSkipAudit(ev, floor(col("event_id") / 2000).cast("long"),
      "ts", lit("2024-01-25").cast("timestamp")).collect()
    val skipped = rows.filter(_.getAs[Int]("skippable") == 1)
    // 30 days of data, cutoff at day 25, time-ordered ids: ~4/5 of the
    // zones must prune
    assert(skipped.length.toDouble / rows.length > 0.5,
      s"expected most zones skippable, got ${skipped.length}/${rows.length}")
  }

  // --------------------------------------------------------------- hist2d

  test("hist2d: joint counts match hand-binned values, max closes into last bin") {
    val df = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 0.0), (10.0, 10.0), (5.0, 5.0))
      .toDF("x", "y")
    val got = Profile.hist2d(df, "x", "y", 2, 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(got == Map((0, 0) -> 1L, (0, 1) -> 1L, (1, 0) -> 1L,
      (1, 1) -> 2L)) // (5,5) bins to (1,1); maxes close into bin 1
  }

  test("hist2d: cell counts conserve the non-null row population") {
    val li = engine.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val total = li.filter(col("l_quantity").isNotNull && col("l_discount").isNotNull).count()
    val binned = Profile.hist2d(li, "l_quantity", "l_discount", 10, 10)
      .agg(sum("n")).as[Long].head()
    assert(binned == total)
  }

  // ----------------------------------------------------------- mutualInfo

  test("mutualInfo: independent columns give ~0, dependent columns give ln(2)") {
    // perfectly dependent: b == a
    val dep = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y")).toDF("a", "b")
    val miDep = Profile.mutualInfo(dep, "a", "b").agg(sum("mi_term")).as[Double].head()
    assert(math.abs(miDep - math.log(2)) < 1e-4)
    // independent: all four combinations equally likely
    val ind = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")).toDF("a", "b")
    val miInd = Profile.mutualInfo(ind, "a", "b").agg(sum("mi_term")).as[Double].head()
    assert(math.abs(miInd) < 1e-9)
  }

  // -------------------------------------------------------- joinSkewAudit

  test("joinSkewAudit ranks keys by count product, excludes NULLs, caps at topK") {
    val left = Seq(Some(1L), Some(1L), Some(1L), Some(2L), None)
      .toDF("k")
    val right = Seq(Some(1L), Some(2L), Some(2L), Some(2L), None)
      .toDF("k")
    val audit = Profile.joinSkewAudit(left, right, "k", "k", topK = 1)
    // est_pairs is DOUBLE by contract: a >3e9-per-side hot key — the exact
    // key this audit exists to surface — silently overflows a LONG product
    // and falls out of the top-K
    assert(audit.schema("est_pairs").dataType ==
      org.apache.spark.sql.types.DoubleType)
    val rows = audit.collect()
    assert(rows.length == 1)
    // key 1: 3x1=3; key 2: 1x3=3 — tie broken by key ascending
    assert(rows.head.getAs[Long]("key") == 1L)
    assert(rows.head.getAs[Double]("est_pairs") == 3.0)
  }

  test("joinSkewAudit est_pairs equals the true join output count per key") {
    val li = engine.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val audit = Profile.joinSkewAudit(li, li, "l_partkey", "l_partkey", topK = 5)
      .collect()
    val top = audit.head
    val actual = li.filter(col("l_partkey") === top.getAs[Long]("key")).count()
    assert(top.getAs[Double]("est_pairs") == (actual * actual).toDouble)
  }

  // ------------------------------------------------------- pathSignatures

  test("pathSignatures: prefix paths with deterministic order, short actors keep their path") {
    val df = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"), // a>b>c
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "c"),                // a>b>c
      (3L, 1L, "z")                                               // z (bounce)
    ).toDF("uid", "seq", "et")
      .withColumn("ts", timestamp_seconds(col("seq")))
      .withColumn("eid", col("seq"))
    val got = Events.pathSignatures(df, "uid", "ts", "et", "eid", depth = 3)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_actors")).toMap
    assert(got == Map("a>b>c" -> 2L, "z" -> 1L))
  }

  test("pathSignatures: same-timestamp ties order by id inside the path") {
    val df = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"))
      .toDF("uid", "sec", "eid", "et")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val paths = Events.pathSignatures(df, "uid", "ts", "et", "eid", depth = 2)
      .select("path").as[String].collect()
    assert(paths.toSeq == Seq("a>b"))
  }

  // ------------------------------------------------------------ zipfSlope

  test("zipfSlope: an exact power law recovers its exponent") {
    // craft term frequencies freq = round(1000 / rank): slope ~ -1
    val docs = (1 to 50).flatMap { rank =>
      val freq = math.max(1, math.round(1000.0 / rank).toInt)
      Seq.fill(freq)(f"term$rank%03d") // term001 repeated 1000x, etc.
    }.map(t => Tuple1(t)).toDF("text")
    val row = TextAnalysis.zipfSlope(docs, "text", topN = 50).collect().head
    assert(row.getAs[Long]("n_terms") == 50)
    val slope = row.getAs[Double]("slope")
    assert(slope < -0.9 && slope > -1.1, s"slope $slope not ~ -1")
    assert(row.getAs[Double]("r2") > 0.99)
  }

  test("zipfSlope: deterministic under ties and bounded by topN") {
    val docs = Seq("a b c d e f g h", "a b c d").map(Tuple1(_)).toDF("text")
    val row = TextAnalysis.zipfSlope(docs, "text", topN = 5).collect().head
    assert(row.getAs[Long]("n_terms") == 5)
  }

  // -------------------------------------------------------- quantileDrift

  test("quantileDrift: identical snapshots give 0 deltas; one-sided groups surface with NULLs") {
    val ref = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0), ("b", 20.0))
      .toDF("g", "v")
    val cmp = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("c", 5.0))
      .toDF("g", "v")
    val rows = Profile.quantileDrift(ref, cmp, "g", "v", Seq(0.5))
      .orderBy("g").collect()
    assert(rows.length == 3)
    val a = rows(0)
    assert(a.getAs[Double]("d_p50") == 0.0)
    val b = rows(1) // ref-only group: cmp side and delta NULL
    assert(b.isNullAt(b.fieldIndex("p50_cmp")) && b.isNullAt(b.fieldIndex("d_p50")))
    assert(b.getAs[Double]("p50_ref") == 15.0)
    val c = rows(2) // cmp-only group
    assert(c.isNullAt(c.fieldIndex("p50_ref")) && c.getAs[Double]("p50_cmp") == 5.0)
  }

  test("quantileDrift detects a one-group median shift the other groups don't share") {
    val ref = Seq(("a", 10.0), ("a", 20.0), ("b", 10.0), ("b", 20.0)).toDF("g", "v")
    val cmp = Seq(("a", 10.0), ("a", 20.0), ("b", 110.0), ("b", 120.0)).toDF("g", "v")
    val d = Profile.quantileDrift(ref, cmp, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("d_p50")).toMap
    assert(d == Map("a" -> 0.0, "b" -> 100.0))
  }

  // --------------------------------------------------- seasonalityProfile

  test("seasonalityProfile: known cells, Spark dow convention, shares sum to 1") {
    // 2024-01-07 is a Sunday (dow 1), 2024-01-08 a Monday (dow 2)
    val df = Seq(
      ("2024-01-07 05:00:00", 1), ("2024-01-07 05:30:00", 2),
      ("2024-01-08 23:10:00", 3), ("2024-01-08 05:00:00", 4)
    ).toDF("s", "id").withColumn("ts", to_timestamp(col("s")))
    val rows = Events.seasonalityProfile(df, "ts").collect()
    val cells = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(cells == Map((1, 5) -> 2L, (2, 23) -> 1L, (2, 5) -> 1L))
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
  }

  // --------------------------------------------------------- groupEntropy

  test("groupEntropy: uniform group hits ln(k) with evenness 1; single-category group NULLs evenness") {
    val df = Seq(("u", "x"), ("u", "y"), ("m", "x"), ("m", "x")).toDF("g", "c")
    val rows = Profile.groupEntropy(df, "g", "c").orderBy("g").collect()
    val m = rows(0)
    assert(m.getAs[Double]("entropy") == 0.0 && m.isNullAt(m.fieldIndex("evenness")))
    val u = rows(1)
    assert(math.abs(u.getAs[Double]("entropy") - math.log(2)) < 1e-4)
    assert(u.getAs[Double]("evenness") == 1.0)
    assert(u.getAs[Long]("n") == 2 && u.getAs[Long]("n_cats") == 2)
  }

  test("groupEntropy counts NULL as a real category (encoding-drift contract)") {
    val df = Seq(("g", "x"), ("g", null)).toDF("grp", "c")
    val row = Profile.groupEntropy(df, "grp", "c").collect().head
    assert(row.getAs[Long]("n_cats") == 2)
    assert(math.abs(row.getAs[Double]("entropy") - math.log(2)) < 1e-4)
  }

  // ----------------------------------------------------------- burstiness

  test("burstiness: metronome fano 0, bursty actor > 1, single-period actor NULL") {
    val events = Seq(
      // actor 1: exactly 2/day for 4 days — fano 0
      (1L, 0, 2), (1L, 1, 2), (1L, 2, 2), (1L, 3, 2),
      // actor 2: 1,1,1,9 — mean 3, var 12, fano 4
      (2L, 0, 1), (2L, 1, 1), (2L, 2, 1), (2L, 3, 9),
      // actor 3: one active day
      (3L, 0, 5)
    ).flatMap { case (u, day, k) =>
      (0 until k).map(i => (u, day.toLong * 86400 + i))
    }.toDF("uid", "sec").withColumn("ts", timestamp_seconds(col("sec")))
    val rows = Events.burstiness(events, "uid", "ts", "day")
      .orderBy("uid").collect()
    assert(rows(0).getAs[Double]("fano") == 0.0)
    assert(rows(0).getAs[Double]("mean_n") == 2.0)
    assert(rows(1).getAs[Double]("fano") == 4.0)
    assert(rows(1).getAs[Double]("var_n") == 12.0)
    assert(rows(2).isNullAt(rows(2).fieldIndex("var_n"))
      && rows(2).isNullAt(rows(2).fieldIndex("fano")))
    assert(rows(2).getAs[Long]("n_periods") == 1)
  }

  // ---------------------------------------------------------- lorenzCurve

  test("lorenzCurve: uniform mass gives flat shares; cum closes at 1; counts conserve") {
    val df = (1 to 100).map(i => (i.toLong, 10.0)).toDF("id", "v")
    val rows = Profile.lorenzCurve(df, "v", nBins = 4).orderBy("bin").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == 100)
    assert(rows.last.getAs[Double]("cum_share") == 1.0)
    // identical values: every row lands in the last bin (cuts all equal)
    // OR spreads — either way total mass is exact
    assert(rows.map(_.getAs[Double]("mass")).sum == 1000.0)
  }

  test("lorenzCurve: concentration shows in the top bin's share") {
    // 99 rows of 1.0 and one row of 901.0 => top bin holds >= 90% of mass
    val df = ((1 to 99).map(i => (i.toLong, 1.0)) :+ (100L, 901.0)).toDF("id", "v")
    val rows = Profile.lorenzCurve(df, "v", nBins = 10).collect()
    val topShare = rows.maxBy(_.getAs[Int]("bin")).getAs[Double]("share")
    assert(topShare >= 0.9, s"top share $topShare")
  }

  test("lorenzCurve fails loudly on negative mass") {
    val df = Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v")
    val e = intercept[Exception] {
      Profile.lorenzCurve(df, "v", nBins = 2).collect()
    }
    assert(e.getMessage.contains("Lorenz domain"))
  }

  // ------------------------------------------------------ seasonalAnomaly

  test("seasonalAnomaly: a spiked slot scores the exact integer-derived z; singleton cells NULL") {
    // same (dow,hod) cell across 3 weeks: counts 10, 10, 22
    // k=3, s=42, sq=584, m2=3*584-1764=-12? recompute: 100+100+484=684;
    // m2 = 3*684 - 42^2 = 2052 - 1764 = 288; z(22) = (3*22-42)/sqrt(288)
    val mondays = Seq("2024-01-01", "2024-01-08", "2024-01-15")
    val counts = Seq(10, 10, 22)
    val rows = mondays.zip(counts).flatMap { case (d, k) =>
      (0 until k).map(i => (s"$d 09:00:${"%02d".format(i % 60)}", i))
    }
    val df = rows.toDF("s", "i").withColumn("ts", to_timestamp(col("s")))
    val got = Profile.seasonalAnomaly(df, "ts").orderBy("slot").collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("k") == 3))
    val z = got.last.getAs[Double]("z")
    assert(math.abs(z - (3 * 22 - 42) / math.sqrt(288.0)) < 1e-12)
    // zero-variance cell -> NULL z
    val flat = Seq("2024-01-02 10:00:00", "2024-01-09 10:00:00")
      .map((_, 1)).toDF("s", "i").withColumn("ts", to_timestamp(col("s")))
    val fz = Profile.seasonalAnomaly(flat, "ts").collect()
    assert(fz.forall(_.isNullAt(5)))
  }

  // ---------------------------------------------------------- activeUsers

  test("activeUsers: DAU/WAU/MAU over a crafted window, stickiness exact") {
    // user 1 active days 1 and 10; user 2 active day 10 only
    val df = Seq(
      (1L, "2024-01-01 05:00:00"), (1L, "2024-01-10 06:00:00"),
      (2L, "2024-01-10 07:00:00"), (2L, "2024-01-10 08:00:00")
    ).toDF("uid", "s").withColumn("ts", to_timestamp(col("s")))
    val rows = Events.activeUsers(df, "uid", "ts").orderBy("day").collect()
    assert(rows.length == 2)
    val d1 = rows(0)
    assert(d1.getAs[Long]("dau") == 1 && d1.getAs[Long]("wau") == 1
      && d1.getAs[Long]("mau") == 1)
    val d10 = rows(1)
    // day 10: both users today; trailing 7d excludes day 1 (10-7=3 < ...):
    // window (day3, day10] — day 1 outside => wau 2; 30d window includes
    // day 1 but user 1 is active today anyway => mau 2
    assert(d10.getAs[Long]("dau") == 2 && d10.getAs[Long]("wau") == 2
      && d10.getAs[Long]("mau") == 2)
    assert(d10.getAs[Double]("stickiness") == 1.0)
  }

  test("activeUsers: WAU window is exactly 7 trailing days, inclusive of today") {
    val df = Seq(
      (1L, "2024-01-01 05:00:00"), // exactly 7 days before Jan 8: inside (Jan1, Jan8]? Jan 8 - 7 = Jan 1 -> excluded (strict >)
      (2L, "2024-01-02 05:00:00"), // inside
      (3L, "2024-01-08 05:00:00")
    ).toDF("uid", "s").withColumn("ts", to_timestamp(col("s")))
    val d8 = Events.activeUsers(df, "uid", "ts").filter(col("day") === "2024-01-08")
      .collect().head
    assert(d8.getAs[Long]("wau") == 2) // users 2 and 3; user 1 aged out
    assert(d8.getAs[Long]("mau") == 3)
  }

  // -------------------------------------------------------- conversionLag

  test("conversionLag: first-from to first-at-or-after-to, exact micros; non-converters excluded") {
    val df = Seq(
      (1L, 100L, "view"), (1L, 50L, "purchase"),  // purchase BEFORE first view: not a conversion
      (1L, 400L, "purchase"),                     // first purchase after view
      (1L, 900L, "purchase"),                     // later purchase ignored
      (2L, 10L, "view"),                          // never converts
      (3L, 20L, "purchase")                       // converts without ever viewing: excluded
    ).toDF("uid", "sec", "et").withColumn("ts", timestamp_seconds(col("sec")))
    val rows = Events.conversionLag(df, "uid", "ts", "et", "view", "purchase")
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("uid") == 1L)
    assert(rows.head.getAs[Long]("lag_us") == 300L * 1000000L)
  }

  test("conversionLag: zero-lag conversion (same timestamp) counts") {
    val df = Seq((1L, 100L, "view"), (1L, 100L, "purchase"))
      .toDF("uid", "sec", "et").withColumn("ts", timestamp_seconds(col("sec")))
    val rows = Events.conversionLag(df, "uid", "ts", "et", "view", "purchase")
      .collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("lag_us") == 0L)
  }

  // --------------------------------------------------- sessionConcurrency

  test("sessionConcurrency: spanning sessions stab every covered hour; starts counted once") {
    val sessions = Seq(
      ("2024-01-01 10:10:00", "2024-01-01 10:50:00"), // inside hour 10
      ("2024-01-01 10:40:00", "2024-01-01 12:05:00"), // spans 10,11,12
      ("2024-01-01 12:30:00", "2024-01-01 12:45:00")  // inside hour 12
    ).toDF("s0", "s1")
      .select(to_timestamp(col("s0")).as("start"), to_timestamp(col("s1")).as("end"))
    val got = Events.sessionConcurrency(sessions, "start", "end")
      .orderBy("hour").collect()
      .map(r => (r.getTimestamp(0).toString.substring(11, 13),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_starting")))
    assert(got.toSeq == Seq(("10", 2L, 2L), ("11", 1L, 0L), ("12", 2L, 1L)))
  }

  test("sessionConcurrency: an inverted interval raises the family's named diagnostic, not sequence()'s") {
    val bad = Seq(("2024-01-01 12:00:00", "2024-01-01 10:00:00"))
      .toDF("s0", "s1")
      .select(to_timestamp(col("s0")).as("start"), to_timestamp(col("s1")).as("end"))
    val e = intercept[Exception] {
      Events.sessionConcurrency(bad, "start", "end").collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(c => String.valueOf(c.getMessage)).getOrElse("")
    assert(msg.contains("sessionConcurrency: inverted interval"), msg)
  }

  // ------------------------------------------------- seasonalValueAnomaly

  test("seasonalValueAnomaly: a revenue collapse at normal volume scores the exact integer z") {
    // same (dow,hod) cell 3 weeks running: revenue 100.00, 100.00, 10.00
    // (cents 10000, 10000, 1000): k=3, S=21000, SQ=201e6 (in cents²);
    // m2 = 3*201000000 - 441000000 = 162000000; z(1000) = (3*1000-21000)/sqrt(m2)
    val weekSec = 7L * 86400
    val rows = Seq(0L, weekSec, 2 * weekSec).zip(Seq(100.0, 100.0, 10.0))
      .flatMap { case (base, v) =>
        Seq((base + 600, v / 2), (base + 700, v / 2)) // two events per hour
      }
    val df = rows.toDF("sec", "value").withColumn("ts", timestamp_seconds(col("sec")))
    val got = Profile.seasonalValueAnomaly(df, "ts", "value")
      .orderBy("slot").collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("sum_cents")).toSeq == Seq(10000L, 10000L, 1000L))
    val z = got.last.getAs[Double]("z")
    assert(z == (3.0 * 1000 - 21000) / math.sqrt(162000000.0), s"z=$z")
  }

  // ---------------------------------------------------- centroidAlignment

  test("centroidAlignment: a planted foreign vector flags anti-aligned; natives score high") {
    // label A: vectors near +x; one planted vector pointing -x
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.1f)), (2L, 0, Array(1.0f, -0.1f)),
      (3L, 0, Array(0.9f, 0.05f)),
      (4L, 0, Array(-1.0f, 0.0f)), // the mislabeled one
      (10L, 1, Array(0.0f, 1.0f)), (11L, 1, Array(0.1f, 1.0f))
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidAlignment(rows, "vec_id", "label", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("cos_c"), r.getAs[Int]("anti_aligned"))).toMap
    assert(got(4L)._2 == 1, got.toString)   // planted outlier flagged
    assert(got(1L)._2 == 0 && got(1L)._1 > 0.9)
    assert(got(10L)._2 == 0 && got(10L)._1 > 0.9)
  }

  test("centroidAlignment: zero-norm, NaN- and Inf-bearing vectors are excluded, never poison a centroid") {
    // Spark orders NaN GREATER than every double, so a naive norm² > 0
    // gate would pass the NaN vector and turn the whole label's centroid
    // NaN — this pins the finiteness gate
    val rows = Seq(
      (1L, 0, Array(1.0f, 0.0f)),
      (2L, 0, Array(0.0f, 0.0f)),                    // zero norm
      (3L, 0, Array(Float.NaN, 1.0f)),               // NaN component
      (4L, 0, Array(Float.PositiveInfinity, 1.0f))   // Inf component
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.centroidAlignment(rows, "vec_id", "label", "embedding")
      .collect()
    assert(got.map(_.getAs[Long]("vec_id")).toSet == Set(1L))
    // and the surviving vector's score is a real number, not NaN
    assert(got.head.getAs[Double]("cos_c") == 1.0)
  }

  // ---------------------------------------------------- activeUsersSketch

  test("activeUsersSketch: sketch estimates track exact counts within tolerance on the fixture") {
    val ev = engine.Tables.loadEvents(spark, "/root/testdata/sf0.01")
    val rows = Events.activeUsersSketch(ev, "user_id", "ts").collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getAs[Int]("wau_ok") == 1))
    assert(rows.forall(_.getAs[Int]("mau_ok") == 1))
    // and the exact columns equal the exact operator's
    val exact = Events.activeUsers(ev, "user_id", "ts")
      .select("day", "wau", "mau").collect()
      .map(r => r.get(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.forall(r =>
      exact(r.get(0)) == (r.getAs[Long]("wau"), r.getAs[Long]("mau"))))
  }

  // -------------------------------------------------- intervalOverlapJoin

  test("intervalOverlapJoin: closed-interval semantics, bucket-spanning pairs dedupe, NULL bounds drop") {
    import graft.operators.Temporal
    def iv(rows: Seq[(Long, String, String)]) = rows.toDF("id", "s0", "s1")
      .select(col("id"), to_timestamp(col("s0")).as("start"),
        to_timestamp(col("s1")).as("end"))
    val left = iv(Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 13:00:00"), // spans 4 buckets
      (2L, "2024-01-01 09:00:00", "2024-01-01 09:30:00")))
    val right = iv(Seq(
      (10L, "2024-01-01 11:00:00", "2024-01-01 11:10:00"), // inside 1
      (11L, "2024-01-01 13:00:00", "2024-01-01 14:00:00"), // touches 1's end exactly (closed)
      (12L, "2024-01-01 09:31:00", "2024-01-01 09:59:00")  // same bucket as 2, no overlap
    ))
    val got = Temporal.intervalOverlapJoin(left, right,
        Seq("id"), Seq("id"), "start", "end", "start", "end")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // pair (1,11) shares buckets AND touches at the closed boundary; the
    // multi-bucket pair (1,10) appears exactly once; (2,12) is the
    // bucket-cograined false pair the residual filter must kill
    assert(got == Set((1L, 10L), (1L, 11L)))
    // NULL bound drops
    val withNull = iv(Seq((3L, "2024-01-01 10:00:00", "2024-01-01 11:00:00")))
      .union(Seq((4L, null, null)).toDF("id", "s0", "s1")
        .select(col("id"), col("s0").cast("timestamp"), col("s1").cast("timestamp")))
    val n = Temporal.intervalOverlapJoin(withNull, right,
      Seq("id"), Seq("id"), "start", "end", "start", "end").count()
    assert(n == 1) // only id 3 x id 10's 11:00 bucket... overlap check: [10,11] vs [11,11:10] touches at 11:00 -> closed overlap
  }

  test("intervalOverlapJoin fails loudly on an inverted interval; rejects start/end key names") {
    import graft.operators.Temporal
    val bad = Seq((1L, "2024-01-01 12:00:00", "2024-01-01 10:00:00"))
      .toDF("id", "s0", "s1")
      .select(col("id"), to_timestamp(col("s0")).as("b"), to_timestamp(col("s1")).as("e2"))
    val ok = Seq((2L, "2024-01-01 09:00:00", "2024-01-01 13:00:00"))
      .toDF("id", "s0", "s1")
      .select(col("id"), to_timestamp(col("s0")).as("b"), to_timestamp(col("s1")).as("e2"))
    val ex = intercept[Exception] {
      Temporal.intervalOverlapJoin(bad, ok, Seq("id"), Seq("id"),
        "b", "e2", "b", "e2").collect()
    }
    assert(ex.getMessage.contains("inverted interval"))
    val nameEx = intercept[IllegalArgumentException] {
      Temporal.intervalOverlapJoin(ok, ok, Seq("start"), Seq("id"),
        "b", "e2", "b", "e2")
    }
    assert(nameEx.getMessage.contains("collide"))
  }

  // ----------------------------------------------------------- abcClasses

  test("abcClasses: the dominant entity classes A, the tail C; classes partition all entities") {
    // one whale (10000.00) and 40 DISTINCT-mass minnows (i dollars): with
    // identical minnow masses every quantile cut collapses into one bin
    // (the documented one-bin granularity) and the whole corpus classes
    // together — distinct masses spread the bins, so the whale's bin is
    // its own and the smallest minnow's cumulative prefix sits deep in C
    val df = ((1 to 40).map(i => (i.toLong, i.toDouble)) :+ (99L, 10000.0))
      .toDF("k", "v")
    val rows = Profile.abcClasses(df, "k", "v", nBins = 10)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("abc_class")).toMap
    assert(rows.size == 41)
    assert(rows(99L) == "A")
    assert(rows(1L) == "C")
    assert(rows.values.toSet.subsetOf(Set("A", "B", "C")))
  }

  test("abcClasses: mass is exact fixed-point cents summed per entity") {
    val df = Seq((1L, 0.01), (1L, 0.02), (2L, 5.0)).toDF("k", "v")
    val m = Profile.abcClasses(df, "k", "v", nBins = 2)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("mass_cents")).toMap
    assert(m == Map(1L -> 3L, 2L -> 500L))
  }

  test("abcClasses fails loudly on negative mass") {
    val df = Seq((1L, 5.0), (2L, -2.0)).toDF("k", "v")
    val e = intercept[Exception] {
      Profile.abcClasses(df, "k", "v").collect()
    }
    assert(e.getMessage.contains("mass-class domain"))
  }

  // ----------------------------------------------------- containmentPairs

  test("containmentPairs finds an embedded document Jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val big = small + " " + filler
    val df = Seq((1L, small), (2L, big), (3L, "totally unrelated text here now"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text",
        shingleN = 3, minContainment = 0.8, maxShingleDf = None)
      .collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getAs[Long]("a_id") == 1L && p.getAs[Long]("b_id") == 2L)
    assert(p.getAs[Double]("c_a_in_b") >= 0.8) // small fully inside big
    assert(p.getAs[Double]("c_b_in_a") < 0.2)  // big barely inside small
    // and the Jaccard twin at 0.5 does NOT report this pair
    val jac = Dedup.ngramJaccardPairs(df, "doc_id", "text",
      shingleN = 3, minJaccard = 0.5, maxShingleDf = None).collect()
    assert(jac.isEmpty)
  }

  test("containmentPairs: mutual near-duplicates score high in both directions") {
    val a = "one two three four five six seven"
    val b = "one two three four five six eight"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val p = Dedup.containmentPairs(df, "doc_id", "text",
        shingleN = 3, minContainment = 0.5, maxShingleDf = None)
      .collect().head
    assert(p.getAs[Double]("c_a_in_b") > 0.5 && p.getAs[Double]("c_b_in_a") > 0.5)
  }

  test("containmentPairs hot-shingle guard recounts denominators over the filtered universe") {
    // 'x x x' appears in every doc (hot); with maxShingleDf=2 it is removed
    // and containment is computed over the remaining shingles only
    val df = Seq(
      (1L, "x x x a b c d"),
      (2L, "x x x a b c e"),
      (3L, "x x x q r s t")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(df, "doc_id", "text",
        shingleN = 3, minContainment = 0.5, maxShingleDf = Some(2))
      .collect()
    // docs 1,2 share 'a b c' family shingles post-filter; doc 3 shares only
    // the removed hot shingle and cannot pair
    assert(pairs.forall(r =>
      Set(r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) == Set(1L, 2L)))
    assert(pairs.nonEmpty)
  }

  // ------------------------------------------------------- autocorrLag

  test("autocorrLag: a perfect period-2 series scores r(1) = -1 and r(2) = +1; silent hours count as zero") {
    // events only in EVEN hours (2 per hour), odd hours silent — the dense
    // spine must supply the zeros or the 'series' would be constant
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:30:00")
    val ev = (0 until 24).filter(_ % 2 == 0).flatMap { h =>
      Seq(1, 2).map(m => (h.toLong, new java.sql.Timestamp(
        base.getTime + h * 3600L * 1000 + m * 60000)))
    }.toDF("event_id", "ts")
    val r = Events.autocorrLag(ev, "ts", Seq(1, 2))
      .collect().map(x => x.getInt(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // 23 hours of spine (h0..h22): 22 lag-1 pairs, 21 lag-2 pairs
    assert(r(1)._1 == 22L && r(2)._1 == 21L, r.toString)
    assert(math.abs(r(1)._2 + 1.0) < 1e-12, s"lag-1 must be ~-1: ${r(1)}")
    assert(math.abs(r(2)._2 - 1.0) < 1e-12, s"lag-2 must be ~+1: ${r(2)}")
  }

  test("autocorrLag: constant series reports NULL r (zero variance); lags beyond the span drop") {
    val ev = (0 until 6).map(h => (h.toLong, java.sql.Timestamp.valueOf(
      f"2024-01-01 $h%02d:15:00"))).toDF("event_id", "ts")
    val rows = Events.autocorrLag(ev, "ts", Seq(1, 100)).collect()
    assert(rows.length == 1, rows.mkString(",")) // lag 100 has no pairs
    assert(rows.head.isNullAt(2), "constant counts have undefined correlation")
    intercept[IllegalArgumentException](Events.autocorrLag(ev, "ts", Seq(0)))
    // duplicate lags would double-count pairs through the cross join
    intercept[IllegalArgumentException](Events.autocorrLag(ev, "ts", Seq(1, 1)))
  }

  // -------------------------------------------------- attributionCounts

  test("attributionCounts: first/last models credit the right channels; bare conversions land in NULL") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, ts(1), 10L, "view"), (1L, ts(2), 11L, "click"),
      (1L, ts(3), 12L, "purchase"), (1L, ts(4), 13L, "purchase"),
      (2L, ts(1), 20L, "purchase"))  // no touchpoint before it
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = Events.attributionCounts(ev, "user_id", "ts", "event_type",
        "event_id", "purchase")
      .collect()
      .map(x => (x.getString(0), Option(x.getString(1)), x.getLong(2))).toSet
    assert(r == Set(
      ("first_touch", Some("view"), 2L), ("first_touch", None, 1L),
      ("last_touch", Some("click"), 2L), ("last_touch", None, 1L)), r.toString)
  }

  // --------------------------------------------------------- rfmScores

  test("rfmScores: extremes score 5 (best) and 1; money is exact cents; scores stay in 1..5") {
    val orders = Seq(
      // cust 1: recent, frequent, big spender -> 5/5/5
      (1L, "2024-03-10 00:00:00", 100.10), (1L, "2024-03-09 00:00:00", 200.20),
      (1L, "2024-03-08 00:00:00", 300.30), (1L, "2024-03-07 00:00:00", 100.00),
      // cust 2 .. 5: progressively older/smaller
      (2L, "2024-03-01 00:00:00", 80.0), (2L, "2024-02-28 00:00:00", 90.0),
      (3L, "2024-02-01 00:00:00", 50.0), (3L, "2024-01-31 00:00:00", 10.0),
      (4L, "2024-01-10 00:00:00", 30.0),
      (5L, "2024-01-01 00:00:00", 5.0))
      .map { case (c, ts, v) => (c, java.sql.Timestamp.valueOf(ts), v) }
      .toDF("cust", "odate", "amount")
    val r = Profile.rfmScores(orders, "cust", "odate", "amount")
      .collect()
      .map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4), x.getInt(5), x.getInt(6)))
      .toMap
    val (rd1, f1, m1, rs1, fs1, ms1) = r(1L)
    assert(rd1 == 0L && f1 == 4L && m1 == 70060L, r(1L).toString) // exact cents
    assert(rs1 == 5 && fs1 == 5 && ms1 == 5, r(1L).toString)
    val (rd5, _, _, rs5, fs5, ms5) = r(5L)
    assert(rd5 == 69L && rs5 == 1 && fs5 == 1 && ms5 == 1, r(5L).toString)
    assert(r.values.forall { case (_, _, _, a, b, c) =>
      Seq(a, b, c).forall(s => s >= 1 && s <= 5) })
  }

  // --------------------------------------------------------- welchTTest

  test("welchTTest: hand-computed t on exact cents; guards on group count and size") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0)).toDF("g", "v")
    val r = Profile.welchTTest(df, "g", "v").head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getDouble(4) == 200.0 && r.getDouble(5) == 400.0) // cents
    // var_a = 10000, var_b = 40000 (cents^2);
    // t = -200 / sqrt(10000/3 + 40000/3)
    val expected = -200.0 / math.sqrt(10000.0 / 3 + 40000.0 / 3)
    assert(math.abs(r.getDouble(6) - expected) < 1e-12, r.toString)
    // three groups fail loudly (a silently dropped variant is a wrong test)
    val three = df.unionAll(Seq(("c", 1.0), ("c", 2.0)).toDF("g", "v"))
    val e = intercept[Exception](Profile.welchTTest(three, "g", "v").collect())
    assert(e.getMessage.contains("exactly two groups"), e.getMessage)
    // a 1-row group has no variance
    val small = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("g", "v")
    val e2 = intercept[Exception](Profile.welchTTest(small, "g", "v").collect())
    assert(e2.getMessage.contains(">= 2 rows"), e2.getMessage)
  }

  // -------------------------------------------------- cooccurrenceLift

  test("cooccurrenceLift: hand-computed lift; singleton pairs pruned; within-basket duplicates collapse") {
    val li = Seq(
      (10L, "A"), (10L, "B"), (10L, "A"),   // dup (10, A) must collapse
      (20L, "A"), (20L, "B"),
      (30L, "A"), (30L, "C"))
      .toDF("order_id", "part")
    val r = Profile.cooccurrenceLift(li, "order_id", "part", minPairCount = 2)
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    // only (A,B) co-occurs twice; lift = (3 baskets * 2) / (3_A * 2_B) = 1.0
    assert(r.toSeq == Seq(("A", "B", 2L, 1.0)), r.mkString(","))
    // minPairCount 1 admits (A,C): lift = (3*1)/(3*1) = 1.0
    val loose = Profile.cooccurrenceLift(li, "order_id", "part", minPairCount = 1)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(loose == Set(("A", "B"), ("A", "C")), loose.toString)
    intercept[IllegalArgumentException](
      Profile.cooccurrenceLift(li, "order_id", "part", minPairCount = 0))
  }
}
