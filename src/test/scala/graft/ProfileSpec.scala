package graft

import org.apache.spark.sql.functions._
import graft.engine.{Ops, Tables}
import graft.operators.{Events, Profile, TextAnalysis}

/** Profiling, Bloom semi-join, funnel, and text-normalization operators
  * (round-7 scale family). */
class ProfileSpec extends SparkSpec {
  import sqlContext.implicits._

  // ------------------------------------------------------------- histogram

  test("equiWidthHistogram matches a hand-computed reference incl. max-in-last-bin") {
    // 10 values in [0, 10], 5 bins of width 2; 10.0 must close into bin 4
    val df = Seq(0.0, 0.5, 1.9, 2.0, 3.9, 4.0, 6.0, 8.0, 9.9, 10.0).toDF("x")
    val got = Profile.equiWidthHistogram(df, "x", 5)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 3L, 1 -> 2L, 2 -> 1L, 3 -> 1L, 4 -> 3L))
  }

  test("equiWidthHistogram: NULLs excluded, degenerate column lands in bin 0") {
    val withNulls = Seq[java.lang.Double](1.0, null, 1.0, null).toDF("x")
    val got = Profile.equiWidthHistogram(withNulls, "x", 4).collect()
    assert(got.length == 1 && got.head.getInt(0) == 0 && got.head.getLong(1) == 2L)
  }

  test("histogram bin counts sum to the non-null row count (no row lost at boundaries)") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val total = li.filter(col("l_extendedprice").isNotNull).count()
    val binned = Profile.equiWidthHistogram(li, "l_extendedprice", 20)
      .agg(sum("n")).as[Long].head()
    assert(binned == total)
  }

  test("equiDepthHistogram: bins are cut-bounded, exhaustive, and roughly equal-depth") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val n = orders.filter(col("o_totalprice").isNotNull).count()
    val rows = graft.operators.Profile.equiDepthHistogram(orders, "o_totalprice", 4)
      .orderBy("bin").collect()
    assert(rows.map(_.getInt(0)).sameElements(Array(0, 1, 2, 3)))
    assert(rows.map(_.getLong(1)).sum == n)
    // equal depth within the tie-tolerance: each bin holds 25% +- 5%
    rows.foreach(r => assert(math.abs(r.getLong(1) - n / 4.0) < n * 0.05, r))
    // bins don't overlap: hi of bin i <= lo of bin i+1
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2), s"$a vs $b")
    }
  }

  test("equiDepthHistogram approx path (the 100 TB cut computation) matches exact at high accuracy") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val exact = graft.operators.Profile.equiDepthHistogram(orders, "o_totalprice", 4)
      .orderBy("bin").collect()
    val approx = graft.operators.Profile.equiDepthHistogram(
        orders, "o_totalprice", 4, approxAccuracy = Some(100000))
      .orderBy("bin").collect()
    // at accuracy >= group size the sketch is lossless: identical bins
    assert(exact.map(_.toSeq).sameElements(approx.map(_.toSeq)))
  }

  test("equiDepthHistogram is not a global-sort plan (no single-partition window)") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = graft.operators.Profile.equiDepthHistogram(orders, "o_totalprice", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan) // binning is a map-side expression
  }

  test("columnProfile counts match per-column queries incl. a NULL-bearing column") {
    val df = Seq(("a", java.lang.Long.valueOf(1L)), ("b", null),
      ("a", java.lang.Long.valueOf(2L)), ("c", java.lang.Long.valueOf(2L)))
      .toDF("s", "v")
    val got = graft.operators.Profile.columnProfile(df, Seq("s", "v"))
      .orderBy("col_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sameElements(Array(("s", 4L, 0L, 3L), ("v", 4L, 1L, 2L))))
  }

  test("sampleKPerGroup: exactly k per stratum, deterministic, stable under row order") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val s1 = graft.operators.Profile.sampleKPerGroup(docs, "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().sorted
    val s2 = graft.operators.Profile.sampleKPerGroup(
        docs.orderBy(rand(7)), "doc_id", "source", 10)
      .select("doc_id").as[Long].collect().sorted
    assert(s1.sameElements(s2)) // row order cannot change the sample
    val perGroup = graft.operators.Profile.sampleKPerGroup(docs, "doc_id", "source", 10)
      .groupBy("source").count().select("count").as[Long].collect()
    assert(perGroup.forall(_ == 10L))
  }

  test("sampleKPerGroup plan carries WindowGroupLimit (map-side k-row forwarding)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = graft.operators.Profile.sampleKPerGroup(docs, "doc_id", "source", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // --------------------------------------------------------- heavy hitters

  test("heavyHittersChecked: exact counts match a plain groupBy and every cms_ok = 1") {
    val ev = Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val got = Profile.heavyHittersChecked(ev, "user_id", minCount = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val expected = ev.groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.map(t => t._1 -> t._2).toMap == expected)
    assert(got.nonEmpty && got.forall(_._3 == 1),
      s"CMS contract violated for ${got.filter(_._3 == 0).mkString(",")}")
  }

  test("heavyHittersChecked: NULL keys excluded, no NPE even when NULL is heavy") {
    val df = (Seq.fill(50)(Option.empty[Long]) ++ (1 to 50).map(_ => Some(7L)))
      .toDF("k")
    val got = graft.operators.Profile.heavyHittersChecked(df, "k", minCount = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.sameElements(Array((7L, 50L, 1))))
  }

  test("heavyHitters output is bounded: no key below minCount appears") {
    val ev = Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val below = Profile.heavyHitters(ev, "user_id", minCount = 70)
      .filter(col("cnt") < 70).count()
    assert(below == 0)
  }

  // ------------------------------------------------------- bloom semi-join

  test("bloomSemiJoin equals the plain left-semi join on the fixture") {
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val dim = Tables.load(spark, "/root/testdata/sf0.001", "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val viaBloom = Ops.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey",
      expectedItems = 10000L)
    val plain = orders.join(dim.select("c_custkey"),
      orders("o_custkey") === dim("c_custkey"), "left_semi")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
  }

  test("bloomSemiJoin: high-fpp filter still yields exact results (verify join removes FPs)") {
    val fact = (1 to 1000).map(i => i.toLong).toDF("k")
    val dim = Seq(1L, 500L, 999L).toDF("d")
    // fpp 0.5 guarantees plenty of Bloom false positives at this size
    val got = Ops.bloomSemiJoin(fact, dim, "k", "d", expectedItems = 3L, fpp = 0.5)
      .as[Long].collect().sorted
    assert(got.sameElements(Array(1L, 500L, 999L)))
  }

  test("bloomSemiJoin: mismatched key types (LONG fact vs DECIMAL dim) match exactly") {
    // the Bloom build renders the dim key through the FACT key's type:
    // without that cast, dim 7.00 hashes "7.00" while fact 7 probes "7",
    // and the prefilter drops a row the coercing semi-join matches
    val fact = (1L to 100L).toDF("k")
    val dim = Seq("7.00", "42.00", "3.50").toDF("s")
      .select(col("s").cast("decimal(12,2)").as("d"))
    val got = Ops.bloomSemiJoin(fact, dim, "k", "d", expectedItems = 10L)
      .as[Long].collect().sorted
    val plain = fact.join(dim, fact("k") === dim("d"), "left_semi")
      .as[Long].collect().sorted
    assert(got.sameElements(plain) && got.sameElements(Array(7L, 42L)))
  }

  test("bloomSemiJoin: NULL fact keys never match") {
    val fact = Seq[java.lang.Long](1L, null, 2L).toDF("k")
    val dim = Seq(1L).toDF("d")
    val got = Ops.bloomSemiJoin(fact, dim, "k", "d", expectedItems = 10L)
      .as[Long].collect()
    assert(got.sameElements(Array(1L)))
  }

  // ---------------------------------------------------------------- funnel

  test("funnelReach: window, strict ordering, and earliest-event semantics") {
    val ts = (m: Int) => new java.sql.Timestamp(m * 60000L)
    val ev = Seq(
      // u1 converts fully inside the 10-minute window
      (1L, ts(0), "view"), (1L, ts(5), "click"), (1L, ts(9), "buy"),
      // u2: click outside the window after first view
      (2L, ts(0), "view"), (2L, ts(20), "click"), (2L, ts(21), "buy"),
      // u3: buy BEFORE click — order violated, reaches step 2 only
      (3L, ts(0), "view"), (3L, ts(2), "buy"), (3L, ts(4), "click"),
      // u4: click at the SAME instant as view — strictly-after excludes it
      (4L, ts(0), "view"), (4L, ts(0), "click"),
      // u5: two views; the EARLIEST anchors the window, so the late click misses
      (5L, ts(0), "view"), (5L, ts(8), "view"), (5L, ts(15), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Events.funnelReach(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "buy"), windowMinutes = 10)
      .orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.sameElements(Array((1, "view", 5L), (2, "click", 2L), (3, "buy", 1L))))
  }

  test("funnelReach on the fixture matches the independently computed reach") {
    val ev = Tables.loadEvents(spark, "/root/testdata/sf0.001")
    val got = Events.funnelReach(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowMinutes = 24 * 60)
      .orderBy("step").collect().map(_.getLong(2))
    assert(got.sameElements(Array(15L, 6L, 3L))) // pinned vs DuckDB (see oracle)
  }

  test("partitionStats/skewReport: balanced layout scores ~1, a hot-key layout is flagged, counts conserve rows") {
    val n = 10000
    val df = (1 to n).map(i => (i.toLong, i % 997)).toDF("id", "k")
    // round-robin: as balanced as it gets
    val balanced = df.repartition(8)
    val statsB = graft.operators.Profile.partitionStats(balanced)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(statsB.values.sum == n) // no row lost or double-counted
    val reportB = graft.operators.Profile.skewReport(balanced).head
    assert(reportB.getLong(0) == 8L)
    assert(reportB.getDouble(4) < 1.5, s"balanced skew ${reportB.getDouble(4)}")
    // everything hashed to ONE key: one partition carries all rows
    val skewed = df.repartition(8, lit(1))
    val reportS = graft.operators.Profile.skewReport(skewed).head
    assert(reportS.getLong(0) == 1L) // only the hot partition is non-empty
    assert(reportS.getLong(2) == n.toLong)
    assert(reportS.getDouble(4) == 1.0) // max/avg over NON-EMPTY partitions
    // moderately skewed: 90% of rows on one key across 8 partitions
    val hot = (1 to n).map(i => (i.toLong, if (i <= n * 9 / 10) 0 else i)).toDF("id", "k")
      .repartition(8, col("k"))
    val reportH = graft.operators.Profile.skewReport(hot).head
    assert(reportH.getDouble(4) > 3.0, s"hot-key skew ${reportH.getDouble(4)} not flagged")
  }

  test("psiDrift: identical snapshots score ~0; a shifted snapshot's mass lands in edge bins, not dropped") {
    val ref = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    // identical distribution: every per-bin term is 0 after rounding
    val same = graft.operators.Profile.psiDrift(ref, ref, "v", nBins = 10)
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0), same.mkString(","))
    // comparison side entirely ABOVE the reference range: clamps into the
    // top bin (bin 9), which then carries essentially all comparison mass
    val shifted = (1 to 100).map(i => Tuple1(1000.0 + i)).toDF("v")
    val rows = graft.operators.Profile.psiDrift(ref, shifted, "v", nBins = 10)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows(9)._2 == 1.0, rows.toString)         // all cmp mass in bin 9
    assert(rows(9)._1 == 0.1)                        // ref still uniform
    // total PSI is large (drift) and every bin's term is finite (eps floor)
    val terms = graft.operators.Profile.psiDrift(ref, shifted, "v", nBins = 10)
      .collect().map(_.getDouble(3))
    assert(terms.sum > 0.25, terms.sum.toString)
    assert(terms.forall(t => !t.isNaN && !t.isInfinite))
    // NULLs excluded on both sides, not binned as zeros
    val withNull = (ref.collect().map(_.getDouble(0)).map(Option(_)) :+ None)
      .toSeq.toDF("v")
    assert(graft.operators.Profile.psiDrift(withNull, withNull, "v", nBins = 10)
      .agg(org.apache.spark.sql.functions.sum("psi_term")).head.getDouble(0) == 0.0)
  }

  test("joinEstimate: exact on uniform keys and FK joins; NULL keys excluded; approx tracks exact") {
    val a = (1 to 10).flatMap(k => Seq.fill(3)(Tuple1(k.toLong))).toDF("k")
    val b = (1 to 10).flatMap(k => Seq.fill(4)(Tuple1(k.toLong))).toDF("k")
    val est = graft.operators.Profile.joinEstimate(a, b, Seq("k")).head
    assert((est.getLong(0), est.getLong(1), est.getLong(2), est.getLong(3), est.getLong(4)) ==
      ((30L, 40L, 10L, 10L, 120L)))
    assert(a.join(b, Seq("k")).count() == 120L) // uniform keys: model is exact
    // FK shape: unique right side collapses the estimate to n_a
    val fk = (1 to 40).map(k => Tuple1(k.toLong)).toDF("k")
    val estFk = graft.operators.Profile.joinEstimate(a, fk, Seq("k")).head
    assert(estFk.getLong(4) == 30L)
    // NULL keys never join and never count
    val withNull = a.unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Long])).toDF("k"))
    val estN = graft.operators.Profile.joinEstimate(withNull, b, Seq("k")).head
    assert(estN.getLong(0) == 30L && estN.getLong(2) == 10L)
    // the sketch variant lands on the exact counts at this cardinality
    val estA = graft.operators.Profile.joinEstimate(a, b, Seq("k"), approx = true).head
    assert(estA.getLong(2) == 10L && estA.getLong(3) == 10L)
  }

  test("filterByGroupQuantile: per-group cut keeps each group's upper share; NULL values and all-NULL groups drop") {
    val df = Seq(
      ("en", 1L, 10.0), ("en", 2L, 20.0), ("en", 3L, 30.0), ("en", 4L, 40.0),
      ("de", 5L, 1.0), ("de", 6L, 2.0), ("de", 7L, 3.0)
    ).toDF("lang", "id", "score")
    val kept = graft.operators.Profile.filterByGroupQuantile(df, "lang", "score", 0.5)
      .collect().map(_.getAs[Long]("id")).toSet
    // en median 25 -> 3,4; de median 2 -> 6,7 (at-or-above keeps the cut row)
    assert(kept == Set(3L, 4L, 6L, 7L))
    // NULL scores drop; a group with only NULLs contributes nothing
    val withNulls = df.unionByName(Seq(
      ("en", 8L, null.asInstanceOf[java.lang.Double]),
      ("xx", 9L, null.asInstanceOf[java.lang.Double]))
      .toDF("lang", "id", "score"))
    val kept2 = graft.operators.Profile.filterByGroupQuantile(withNulls, "lang", "score", 0.5)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(kept2 == Set(3L, 4L, 6L, 7L))
  }

  test("psiDrift: an empty or all-NULL reference snapshot fails loudly, not a NULL-bin row set") {
    val cmp = (1 to 10).map(i => Tuple1(i.toDouble)).toDF("v")
    for (ref <- Seq(
        Seq.empty[Option[Double]].toDF("v"),
        Seq[Option[Double]](None, None).toDF("v"))) {
      val e = intercept[Exception](
        graft.operators.Profile.psiDrift(ref, cmp, "v", nBins = 10).collect())
      // the raise_error may arrive wrapped in a task-failure exception
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).mkString(" | ")
      assert(msgs.contains("no non-NULL"), s"expected a loud bounds failure, got: $msgs")
    }
  }

  test("psiDriftCategorical: vanished and appeared categories surface via eps; NULL is a category") {
    val ref = (Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("fr"))
      .map(Tuple1(_)).toDF("lang")
    val cmp = (Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("zh"))
      .map(Tuple1(_)).toDF("lang")
    val rows = graft.operators.Profile.psiDriftCategorical(ref, cmp, "lang")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set("en", "de", "fr", "zh"))
    assert(rows("en")._3 == 0.0 && rows("de")._3 == 0.0)
    // fr vanished, zh appeared: both get the eps floor on the absent side
    // and a large positive term — (0.2 - 1e-6) * ln(0.2/1e-6) ~ 2.4412
    assert(rows("fr") == (0.2, 1.0e-6, 2.4412), rows("fr").toString)
    assert(rows("zh") == (1.0e-6, 0.2, 2.4412), rows("zh").toString)
    // NULL category participates instead of silently dropping
    val withNull = (Seq.fill(99)(Some("en")) :+ None).toDF("lang")
    val nn = graft.operators.Profile.psiDriftCategorical(ref, withNull, "lang")
      .filter(col("lang").isNull).count()
    assert(nn == 1L)
  }

  test("rateAnomalies: spike hour flagged, steady key drops out (stddev 0)") {
    val base = 1700000000000L
    val hourTs = (h: Int, i: Int) => new java.sql.Timestamp(base + h * 3600000L + i * 1000L)
    val spiky = (0 until 9).flatMap(h => (0 until 2).map(i => (hourTs(h, i), "spiky"))) ++
      (0 until 20).map(i => (hourTs(9, i), "spiky"))
    val steady = (0 until 10).flatMap(h => (0 until 3).map(i => (hourTs(h, i), "steady")))
    val ev = (spiky ++ steady).toDF("ts", "event_type")
    val got = graft.operators.Events.rateAnomalies(ev, "ts", "event_type", zThreshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    // counts 2x9 + one 20-spike: mean 3.8, sd ~5.69 -> z ~ 2.847; steady sd=0
    assert(got.length == 1)
    assert(got.head._1 == "spiky" && got.head._2 == 20L)
    assert(math.abs(got.head._3 - 2.8460) < 0.001, got.head.toString)
  }

  test("rateAnomalies: a corrupt-timestamp key over maxSpineHours fails loudly, never silently explodes the spine") {
    val base = 1700000000000L
    val hourTs = (h: Int, i: Int) => new java.sql.Timestamp(base + h * 3600000L + i * 1000L)
    val normal = (0 until 5).flatMap(h => (0 until 3).map(i => (hourTs(h, i), "ok")))
    // one epoch-adjacent record: its key's spine would span ~54 years of hours
    val corrupt = Seq((new java.sql.Timestamp(1000L), "bad"), (hourTs(4, 0), "bad"))
    val ev = (normal ++ corrupt).toDF("ts", "event_type")
    val e = intercept[Exception] {
      graft.operators.Events.rateAnomalies(ev, "ts", "event_type").collect()
    }
    // Spark wraps raise_error in a SparkRuntimeException; the message must
    // name the key and the remedy
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("bad") && m.contains("maxSpineHours")),
      msgs(e).mkString("\n"))
    // a raised bound admits the span again (8 hours fits in the default too)
    val ok = graft.operators.Events.rateAnomalies(ev.filter(col("event_type") === "ok"),
      "ts", "event_type", maxSpineHours = 10)
    assert(ok.count() >= 0)
  }

  test("rateAnomalies: a dead source's silent trailing hours are zero-filled and flagged") {
    val base = 1700000000000L
    val hourTs = (h: Int, i: Int) => new java.sql.Timestamp(base + h * 3600000L + i * 1000L)
    // 'dead' runs at 10/hour for hours 0-9 then stops; 'alive' runs through
    // hour 11, extending the global spine past dead's last event
    val dead = (0 until 10).flatMap(h => (0 until 10).map(i => (hourTs(h, i), "dead")))
    val alive = (0 until 12).flatMap(h => (0 until 3).map(i => (hourTs(h, i), "alive")))
    val ev = (dead ++ alive).toDF("ts", "event_type")
    val got = graft.operators.Events.rateAnomalies(ev, "ts", "event_type", zThreshold = 2.0)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    // dead's counts: ten 10s + two zero-filled hours -> mean 8.333,
    // sd 3.8925, z(0) = -2.1411; alive is constant-rate (sd 0, drops out)
    assert(got.length == 2, got.mkString(","))
    assert(got.forall(r => r._1 == "dead" && r._2 == 0L && math.abs(r._3 + 2.1411) < 0.001),
      got.mkString(","))
  }

  test("groupQuantiles: exact per-group cuts; approx path agrees on small groups") {
    val df = ((1 to 5).map(i => ("a", i.toLong)) ++ Seq(("b", 7L), ("b", 7L)))
      .toDF("g", "v")
    val exact = graft.operators.Profile.groupQuantiles(df, "g", "v", Seq(0.25, 0.5, 0.75))
      .orderBy("g").collect()
    // a: 1..5 -> linear-interpolated quartiles 2, 3, 4; b: constant 7
    assert(exact(0).getString(0) == "a" &&
      (1 to 3).map(exact(0).getDouble) == Seq(2.0, 3.0, 4.0))
    assert(exact(1).getString(0) == "b" &&
      (1 to 3).map(exact(1).getDouble) == Seq(7.0, 7.0, 7.0))
    // at accuracy >= group size the sketch is exact too — same rows
    val approx = graft.operators.Profile.groupQuantiles(df, "g", "v",
      Seq(0.25, 0.5, 0.75), approxAccuracy = Some(10000))
      .orderBy("g").collect()
    assert(exact.map(_.toSeq).toSeq == approx.map(_.toSeq).toSeq)
  }

  test("slidingCounts: an event lands in exactly width/slide epoch-aligned windows") {
    // :45 event with 60-min windows sliding every 30: starts :00 and :30 only
    val h = 1700000000000L - (1700000000000L % 3600000L)
    val ev = Seq((new java.sql.Timestamp(h + 45 * 60000L), "a")).toDF("ts", "event_type")
    val got = graft.operators.Events.slidingCounts(ev, "ts", "event_type", 60, 30)
      .orderBy("win_start").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime, r.getLong(3)))
    assert(got.toSeq == Seq((h, h + 3600000L, 1L), (h + 1800000L, h + 5400000L, 1L)),
      got.mkString(","))
  }

  test("chiSquare: hand-computed 2x2 contingency (obs, expected, contribution)") {
    // cells: (x,p)=30 (x,q)=10 (y,p)=10 (y,q)=50; N=100
    // rt: x=40 y=60; ct: p=40 q=60
    // e(x,p)=16, chi2=(30-16)^2/16=12.25; e(x,q)=24, chi2=(10-24)^2/24=8.1667
    // e(y,p)=24, chi2=8.1667; e(y,q)=36, chi2=(50-36)^2/36=5.4444
    val rows = Seq.fill(30)(("x", "p")) ++ Seq.fill(10)(("x", "q")) ++
      Seq.fill(10)(("y", "p")) ++ Seq.fill(50)(("y", "q"))
    val got = graft.operators.Profile.chiSquare(rows.toDF("a", "b"), "a", "b")
      .orderBy("a", "b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      ("x", "p", 30L, 16.0, 12.25), ("x", "q", 10L, 24.0, 8.1667),
      ("y", "p", 10L, 24.0, 8.1667), ("y", "q", 50L, 36.0, 5.4444)), got.mkString(","))
  }

  test("winsorize: values clip to the group's own quantiles; NULLs pass through") {
    val df = ((1 to 100).map(i => ("g", java.lang.Long.valueOf(i.toLong))) :+
      ("g", null.asInstanceOf[java.lang.Long])).toDF("k", "v")
    val got = graft.operators.Profile.winsorize(df, "k", "v", pLo = 0.05, pHi = 0.95)
      .collect().map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // quantile_cont over 1..100: p5 = 5.95, p95 = 95.05 (linear interpolation)
    assert(got(Some(1L)) == Some(5.95))
    assert(got(Some(100L)) == Some(95.05))
    assert(got(Some(50L)) == Some(50.0))
    assert(got(None).isEmpty) // NULL value -> NULL clipped, row retained
  }

  test("cohortRetention: users land in their first-seen day's cohort, retention counted per offset") {
    val day0 = 1700000000000L - (1700000000000L % 86400000L) // midnight-aligned
    val at = (day: Int, h: Int) => new java.sql.Timestamp(day0 + day * 86400000L + h * 3600000L)
    // u1 first on day 0, returns day 1; u2 only day 0 (twice — distinct
    // collapses); u3 first on day 1
    val ev = Seq((1L, at(0, 1)), (1L, at(1, 2)), (2L, at(0, 3)), (2L, at(0, 9)),
      (3L, at(1, 5))).toDF("user_id", "ts")
    val got = graft.operators.Events.cohortRetention(ev, "user_id", "ts", "day")
      .orderBy("cohort", "period_offset").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getInt(1), r.getLong(2)))
    val d0 = day0; val d1 = day0 + 86400000L
    assert(got.toSeq == Seq((d0, 0, 2L), (d0, 1, 1L), (d1, 0, 1L)), got.mkString(","))
  }

  // -------------------------------------------------- text normalization

  test("NfcNormalize: decomposed and composed forms become identical; NULL passes through") {
    val composed = "café"            // é as U+00E9
    val decomposed = "café"         // e + combining acute
    assert(composed != decomposed)   // distinct byte sequences going in
    val df = Seq(composed, decomposed, null).toDF("t")
    val got = df.select(graft.plans.NfcNormalize.nfc(col("t")).as("n"))
      .as[String].collect()
    assert(got(0) == composed && got(1) == composed && got(2) == null)
  }

  test("NfcNormalize is codegen'd (no ScalaUDF in the plan)") {
    // parquet-backed input: a local Seq would constant-fold the whole
    // projection into a LocalTableScan and hide the expression
    val df = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = df.select(graft.plans.NfcNormalize.nfc(col("text")).as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_nfc"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
  }

  test("NfcNormalize properties: idempotent, ASCII-identity, JDK-equivalent (seeded gen)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // mixed ascii / latin-1 / combining marks / CJK — the NFC-interesting space
    val charGen = Gen.frequency(
      6 -> Gen.choose(32.toChar, 126.toChar),
      2 -> Gen.choose(0x00C0.toChar, 0x017F.toChar),
      2 -> Gen.choose(0x0300.toChar, 0x036F.toChar),
      1 -> Gen.choose(0x4E00.toChar, 0x4E80.toChar))
    val strGen = Gen.listOfN(40, charGen).map(_.mkString)
    val strings = (1 to 64).map(i =>
      strGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val asciiOnly = strings.map(_.filter(_ < 127.toChar))
    val df = (strings ++ asciiOnly).toDF("t")
      .select(col("t"), graft.plans.NfcNormalize.nfc(col("t")).as("n"))
      .select(col("t"), col("n"), graft.plans.NfcNormalize.nfc(col("n")).as("nn"))
    df.collect().foreach { r =>
      val (t, n, nn) = (r.getString(0), r.getString(1), r.getString(2))
      assert(nn == n, s"not idempotent on: $t")
      assert(n == java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC),
        s"diverges from JDK on: $t")
      if (t.forall(_ < 127.toChar)) assert(n == t, s"ASCII changed: $t")
    }
  }

  test("withNormalizedText lowers, collapses whitespace, trims, and NFC-normalizes") {
    val df = Seq("  Hello\t\tWORLD  café \n", "ok").toDF("text")
    val got = TextAnalysis.withNormalizedText(df, "text")
      .select("text_norm").as[String].collect()
    assert(got(0) == "hello world café")
    assert(got(1) == "ok")
  }

  test("datasetCard: counts, cardinalities, and the exact-dup tally on a crafted corpus") {
    val docs = Seq(
      (1L, Some("a b c"), "en", "web"),
      (2L, Some("a b c"), "en", "web"),     // dup of 1
      (3L, Some("a b c"), "de", "book"),    // dup of 1 (same text)
      (4L, Some("x y"), "en", "web"),
      (5L, Option.empty[String], "fr", "scan"))
      .toDF("doc_id", "text", "lang", "source")
    val r = graft.operators.Profile.datasetCard(docs, "doc_id", "text", "lang", "source")
      .collect().head
    assert(r.getLong(0) == 5 && r.getLong(1) == 1, r.toString)   // docs, null text
    assert(r.getLong(2) == 3 * 3 + 2, r.toString)                // tokens (nulls contribute 0)
    assert(r.getLong(3) == 3 && r.getLong(4) == 3, r.toString)   // langs, sources
    // one dup group of 3 docs -> 2 removable dups, rate 0.4
    assert(r.getLong(7) == 1 && r.getLong(8) == 2, r.toString)
    assert(r.getDouble(9) == 0.4, r.toString)
    // a dup-free corpus reports honest zeros, not NULLs
    val clean = graft.operators.Profile.datasetCard(
      Seq((1L, "a", "en", "w")).toDF("doc_id", "text", "lang", "source"),
      "doc_id", "text", "lang", "source").collect().head
    assert(clean.getLong(7) == 0 && clean.getLong(8) == 0 && clean.getDouble(9) == 0.0,
      clean.toString)
  }

  test("groupGini: 0 on uniform mass, near-1 on total concentration; domain guards") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("even", 1L, 10L), ("even", 2L, 10L), ("even", 3L, 10L), ("even", 4L, 10L),
      ("conc", 11L, 0L), ("conc", 12L, 0L), ("conc", 13L, 0L), ("conc", 14L, 1000L),
      ("zero", 21L, 0L), ("zero", 22L, 0L))
      .toDF("g", "id", "v")
    val out = graft.operators.Profile.groupGini(df, "g", "v", "id")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("even") == (4L, Some(0.0)), out.toString)
    // all mass in 1 of 4 rows: G = 2*4/(4*1) - 5/4 = 0.75 (the n-finite max)
    assert(out("conc") == (4L, Some(0.75)), out.toString)
    assert(out("zero") == (2L, None), out.toString)
    // negative values fail loudly, not a nonsense coefficient
    val neg = Seq(("g", 1L, -5L)).toDF("g", "id", "v")
    intercept[Exception] {
      graft.operators.Profile.groupGini(neg, "g", "v", "id").collect()
    }
    // fractional columns are rejected at construction (a silent long-cast
    // would truncate every sub-1.0 score to zero mass)
    val frac = Seq(("g", 1L, 0.7)).toDF("g", "id", "v")
    intercept[IllegalArgumentException](
      graft.operators.Profile.groupGini(frac, "g", "v", "id"))
  }

  test("withQuantileBin: equi-depth deciles balanced on uniform data; NULL gets NULL bin; cuts map-side") {
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).map(i => Some(i.toLong)).toDF("v")
      .unionAll(Seq(Option.empty[Long]).toDF("v"))
    val out = graft.operators.Profile.withQuantileBin(df, "v", nBins = 10)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(out(None).isEmpty)
    // uniform 1..100 into deciles: each bin holds ~10 values, bins span 0..9
    val bins = out.collect { case (Some(_), Some(b)) => b }
    assert(bins.min == 0 && bins.max == 9, bins.toSet.toString)
    val sizes = bins.groupBy(identity).view.mapValues(_.size).values.toSeq
    assert(sizes.forall(s => s >= 9 && s <= 11), sizes.toString)
    // monotone: a larger value never lands in a smaller bin
    val pairs = out.collect { case (Some(v), Some(b)) => v -> b }.toSeq.sortBy(_._1)
    assert(pairs.sliding(2).forall { case Seq(a, b) => a._2 <= b._2; case _ => true })
    intercept[IllegalArgumentException](
      graft.operators.Profile.withQuantileBin(df, "v", 1))
  }

  test("schemaDrift: null-rate and distinct-count regressions surface per column") {
    val ref = Seq((1L, Some("en"), "web"), (2L, Some("de"), "web"), (3L, Some("fr"), "book"))
      .toDF("id", "lang", "source")
    val cur = Seq((1L, None, "web"), (2L, None, "web"), (3L, Some("fr"), "web"))
      .toDF("id", "lang", "source")
    val out = graft.operators.Profile.schemaDrift(ref, cur, Seq("lang", "source"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getLong(7))).toMap
    // lang: nulls 0/3 -> 2/3; distinct 3 -> 1
    assert(out("lang") == (3L, 3L, 0.0, 0.666667, 0.666667, 3L, 1L), out.toString)
    // source: distinct collapsed 2 -> 1, no null movement
    assert(out("source") == (3L, 3L, 0.0, 0.0, 0.0, 2L, 1L), out.toString)
  }

  test("robustZ: outlier-immune where mean/std is not; MAD=0 and NULL values yield NULL") {
    import org.apache.spark.sql.functions.col
    // group g: median 3, MAD 1; the 1000 outlier must NOT drag the center
    val df = Seq(
      ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0), ("g", 1000.0),
      ("flat", 5.0), ("flat", 5.0), ("flat", 5.0),   // MAD 0
      ("n", Double.NaN)).toDF("k", "v")
      .select(col("k"), org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.isnan(col("v")), null).otherwise(col("v")).as("v"))
    val out = graft.operators.Profile.robustZ(df, "k", "v")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    val g = out.filter(_._1 == "g").map(x => x._2 -> x._3).toMap
    // median 3, absdevs {2,1,0,1,997} -> MAD 1: z = 0.6745*(x-3)
    assert(g(1.0).contains(-1.349) && g(3.0).contains(0.0) && g(4.0).contains(0.6745), g.toString)
    // the outlier is correctly FAR out (mean/std would have scored it ~2)
    assert(g(1000.0).exists(_ > 500), g.toString)
    // zero-spread group: NULL z, never Inf
    assert(out.filter(_._1 == "flat").forall(_._3.isEmpty), out.mkString(","))
    // NULL value row survives with NULL z (its group has no median -> row
    // drops with the inner join, same stance as winsorize)
    assert(!out.exists(_._1 == "n"))
  }

  test("fdAudit: violated vs clean determinants; NULL dependents counted apart, not as a value") {
    val df = Seq(
      ("web", Some("en")), ("web", Some("de")),          // violated: 2 langs
      ("book", Some("en")), ("book", Some("en")),        // clean: 1 lang
      ("scan", None), ("scan", Some("fr")),              // NULL + one value: clean
      ("raw", None))                                     // only NULL: clean (no evidence)
      .toDF("source", "lang")
    val r = graft.operators.Profile.fdAudit(df, Seq("source"), "lang")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getInt(4))).toMap
    assert(r("web") == (2L, 2L, 0L, 1), r.toString)
    assert(r("book") == (2L, 1L, 0L, 0), r.toString)
    assert(r("scan") == (2L, 1L, 1L, 0), r.toString)
    assert(r("raw") == (1L, 0L, 1L, 0), r.toString)
    // one partial-aggregated pass: no join, no window in the plan
    val plan = graft.operators.Profile.fdAudit(df, Seq("source"), "lang")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Window"), plan)
    intercept[IllegalArgumentException](
      graft.operators.Profile.fdAudit(df, Seq.empty, "lang"))
    intercept[IllegalArgumentException](
      graft.operators.Profile.fdAudit(df, Seq("lang"), "lang"))
  }
}
