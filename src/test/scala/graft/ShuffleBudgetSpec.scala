package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-budget regression guards: the scale claims ("ships 16-byte
  * hashes, never text", "partial-aggregates before the wire") as
  * EXECUTABLE ceilings, measured with the same task-metrics meter the
  * bench uses. A plan-shape regression that starts shipping payloads
  * (lost map-side combine, text crossing the wire, a broadcast falling
  * back to a shuffled join) blows the ceiling loudly even while results
  * stay correct and timings stay noisy.
  *
  * Ceilings are set ~4-10x above measured sf0.001 values — generous
  * enough for partitioning/serialization drift across Spark upgrades,
  * tight enough that shipping raw text (~290 KB of documents, ~1.4 MB of
  * lineitem) cannot hide. Measurements run against the shared session in
  * its own suite-serial order (ScalaTest runs cases sequentially), which
  * is what makes attribution sound. */
class ShuffleBudgetSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"
  private lazy val meter = new tools.ShuffleMeter(spark)

  override def afterAll(): Unit = meter.close()

  private def shuffleKb(name: String): Double = {
    val bytes = meter.measure(() => {
      // the query's OWN plan, not a fresh count() — planning a count can
      // eliminate joins whose columns it never reads and under-measure
      // the declared plan (the Bench.runPlan rationale)
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count(): Unit
    })
    assert(bytes >= 0, "listener bus failed to drain — measurement void")
    bytes / 1024.0
  }

  test("dedup_exact ships hashes, not documents (<= 64 KB at sf0.001)") {
    val kb = shuffleKb("dedup_exact")
    assert(kb <= 64, s"dedup_exact shuffled $kb KB — is text crossing the wire?")
  }

  test("freq_count partial-aggregates to near nothing (<= 32 KB)") {
    val kb = shuffleKb("freq_count")
    assert(kb <= 32, s"freq_count shuffled $kb KB — lost its map-side combine?")
  }

  test("join_enrich_descr broadcasts the dimension (<= 32 KB)") {
    val kb = shuffleKb("join_enrich_descr")
    assert(kb <= 32, s"join_enrich_descr shuffled $kb KB — broadcast fell back?")
  }

  test("dedup_minhash stays banded (<= 2 MB at sf0.001: signatures + bands, never text)") {
    val kb = shuffleKb("dedup_minhash")
    assert(kb <= 2048, s"dedup_minhash shuffled $kb KB")
  }

  test("decontam_strip ships fingerprints and ids, never per-pair text fan-out (<= 1 MB at sf0.001)") {
    // measured 369 KB at sf0.001 (winnowing fingerprints + pair keys +
    // the partner-hash arrays of the handful of touched docs). The
    // failure mode this guards: a regression that fans corpus TEXT or
    // full benchmark gram sets out per candidate pair multiplies the
    // traffic, it does not add to it — a 2.8x ceiling catches that while
    // tolerating partitioning drift.
    val kb = shuffleKb("decontam_strip")
    assert(kb <= 1024, s"decontam_strip shuffled $kb KB — per-pair payload fan-out?")
  }

  test("hist_bins aggregates map-side (<= 32 KB)") {
    val kb = shuffleKb("hist_bins")
    assert(kb <= 32, s"hist_bins shuffled $kb KB")
  }

  test("decontam_multi stays fingerprint-traffic across N benchmarks (<= 2 MB at sf0.001)") {
    // measured 593 KB at sf0.001 (the strip's 369 KB plus the second
    // benchmark's tagged index and the per-(doc, benchmark) hash
    // arrays). The guard is decontam_strip's extended to the
    // multi-benchmark pass: a regression fanning text or full gram sets
    // per pair MULTIPLIES the traffic past any ceiling, it does not add
    // to it — 3.5x headroom tolerates partitioning drift.
    val kb = shuffleKb("decontam_multi")
    assert(kb <= 2048, s"decontam_multi shuffled $kb KB — per-pair payload fan-out?")
  }
}
