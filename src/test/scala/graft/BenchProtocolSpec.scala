package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench requeue predicate, pinned on the RECORDED driver-run sample
  * shapes that motivated each trigger — the burst-immunity protocol is
  * what makes round-over-round per-key comparison adjudicable, so its
  * logic is spec-frozen like any operator. */
class BenchProtocolSpec extends AnyFunSuite {

  test("trigger (a): median ≫ warm-min — burst ended mid-visit (round-9 shape)") {
    // dedup_exact, round-9 driver run: 2.42s median vs a 0.64s warm sample
    // the burst's end exposed — the lower-median of this extended visit is
    // 2.42 while warm-min is 0.64
    assert(Bench.interfered(Seq(1.0, 2.42, 2.5, 0.64, 2.6)))
  }

  test("trigger (b): warm-min ≫ cold — burst started AFTER the cold sample (round-12 shape)") {
    // tfidf_topterms, BENCH_r12: sampled [1.93, 11.50, 19.25]; median/warm-min
    // = 1.0 so trigger (a) was blind, and the key shipped 11.5 s for a 0.85 s
    // query. Every warm sample > 2x the cold one is interference by
    // construction (cold pays JIT+codegen and is the slowest honest run).
    assert(Bench.interfered(Seq(1.93, 11.50, 19.25)))
    // the other recorded r12 phantom shapes
    assert(Bench.interfered(Seq(0.17, 3.33, 4.1)))  // token_budget 3.33 for 0.17
    assert(Bench.interfered(Seq(0.13, 1.83, 2.2)))  // token_fertility
  }

  test("honest vectors never flag: cold ≥ warm ≈ median") {
    assert(!Bench.interfered(Seq(3.1, 2.8, 2.9)))   // classic JIT-cold shape
    assert(!Bench.interfered(Seq(0.5, 0.5, 0.5)))   // flat
    assert(!Bench.interfered(Seq(9.2, 8.9, 9.0)))   // honest slow query
    assert(!Bench.interfered(Seq(1.0, 1.9, 1.8)))   // warm < 2x cold: no proof
  }

  test("single-sample and empty vectors never flag (no warm evidence)") {
    assert(!Bench.interfered(Seq(4.2)))
    assert(!Bench.interfered(Nil))
  }

  test("warmMin excludes the cold first sample; degenerates to it when alone") {
    assert(Bench.warmMin(Seq(3.0, 1.2, 1.5)) == 1.2)
    assert(Bench.warmMin(Seq(4.2)) == 4.2)
  }

  test("requeue adjudication: only a CLEAN lower-median rerun replaces the visit; dirty ones mark noisy") {
    val flagged = Seq(1.93, 11.50, 19.25) // r12 trigger-(b) shape, median 11.5
    // clean, faster rerun: accepted, key no longer noisy
    val clean = Seq(1.1, 0.85, 0.9)
    assert(Bench.adjudicateRerun(flagged, Some(clean)) == ((clean, false)))
    // rerun itself interfered (burst still running): keep the ORIGINAL
    // median even though the rerun's is lower, and mark the key noisy —
    // the lower of two dirty visits is not evidence
    val dirty = Seq(0.9, 5.1, 2.0) // warm-min 2.0 > 2x cold 0.9 → trigger (b)
    assert(Bench.interfered(dirty))
    assert(Bench.adjudicateRerun(flagged, Some(dirty)) == ((flagged, true)))
    // clean rerun that did NOT improve the median: keep the original
    // samples, but the clean visit still clears the noisy mark
    val cleanSlower = Seq(13.0, 12.0, 12.1)
    assert(Bench.adjudicateRerun(flagged, Some(cleanSlower)) == ((flagged, false)))
    // a SINGLE-sample rerun (budget crossed mid-requeue) carries no warm
    // evidence — interfered() is vacuously false on it, but that is
    // absence of proof, not proof of cleanliness: it must neither replace
    // the visit nor clear the noisy mark
    assert(Bench.adjudicateRerun(flagged, Some(Seq(9.0))) == ((flagged, true)))
    // no rerun happened (budget exhausted): original reported, noisy
    assert(Bench.adjudicateRerun(flagged, None) == ((flagged, true)))
    // honest visit, no rerun: untouched, not noisy
    val honest = Seq(3.1, 2.8, 2.9)
    assert(Bench.adjudicateRerun(honest, None) == ((honest, false)))
  }

  test("cross-round drift: parses the committed BENCH_FULL line and flags >1.5x, the r17 shape the variance triggers missed") {
    // a committed full-suite line's relevant shape (flat key:number pairs
    // inside "queries", other objects around it)
    val prevLine = """{"metric":"total","value":187.5,"unit":"sec","queries":{"pipeline_docs":2.09,"join_skew":0.41,"clean_text":0.52,"topk":0.089},"warm_min":{"pipeline_docs":2.0},"noisy":[],"sf":"/root/testdata/sf0.1"}"""
    val prev = Bench.parsePrevMedians(prevLine, "/root/testdata/sf0.1")
    assert(prev == Map("pipeline_docs" -> 2.09, "join_skew" -> 0.41,
      "clean_text" -> 0.52, "topk" -> 0.089))
    // SF mismatch: a subset run at another scale factor must NOT be
    // judged against this history (observed 3x phantom drift)
    assert(Bench.parsePrevMedians(prevLine, "/root/testdata/sf0.01").isEmpty)
    // r17's pipeline_docs: every sample >= 5.46 s against a 2.09 s
    // committed median — consistent within the visit (interfered() blind,
    // median/warm-min ~ 1), but 3.2x the history
    assert(!Bench.interfered(Seq(6.62, 5.46, 6.7)))
    assert(Bench.driftRatio(prev, "pipeline_docs", 6.62).contains(3.17))
    // within the 1.5x band: quiet
    assert(Bench.driftRatio(prev, "join_skew", 0.55).isEmpty)
    // faster than history is improvement, not drift
    assert(Bench.driftRatio(prev, "clean_text", 0.2).isEmpty)
    // keys with no committed history (new this round) never flag
    assert(Bench.driftRatio(prev, "brand_new_key", 99.0).isEmpty)
    // a malformed / absent queries object degrades to empty, never throws
    assert(Bench.parsePrevMedians("not json at all", "/x").isEmpty)
    assert(Bench.parsePrevMedians("""{"metric":"total"}""", "/x").isEmpty)
  }
}
