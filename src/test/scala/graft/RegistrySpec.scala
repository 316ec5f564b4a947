package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's bookkeeping: every registered query must carry an
  * oracle (a missing one silently downgrades the driver's check to
  * rows-only — the exact hidden-weakening this spec exists to catch) and
  * every oracle must belong to a registered query (an orphan is dead SQL
  * that drifts unmaintained). */
class RegistrySpec extends AnyFunSuite {

  test("query and oracle registries cover each other exactly") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((qs -- os).isEmpty,
      s"registered queries without an oracle: ${(qs -- os).toSeq.sorted.mkString(", ")}")
    assert((os -- qs).isEmpty,
      s"orphan oracles: ${(os -- qs).toSeq.sorted.mkString(", ")}")
  }

  test("oracle SQL is non-empty and references a fixture table") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"$k: empty oracle")
      assert(tables.exists(sql.contains),
        s"$k: oracle references no fixture table — typo in a FROM clause?")
    }
  }
}
