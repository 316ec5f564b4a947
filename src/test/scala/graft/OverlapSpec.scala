package graft

import graft.engine.Overlap

/** Contracts of the driver-side action-overlap helper (optimization guide
  * §2.6): results come back positionally, Spark actions are safe from the
  * pool threads, and a failing arm propagates instead of hanging. */
class OverlapSpec extends SparkSpec {
  import sqlContext.implicits._

  test("par/par3/par4 return each arm's result positionally") {
    assert(Overlap.par(1 + 1, "b") == (2, "b"))
    assert(Overlap.par3("a", 2L, 3.0) == ("a", 2L, 3.0))
    assert(Overlap.par4(1, 2, 3, 4) == (1, 2, 3, 4))
  }

  test("Spark actions run correctly from overlap arms") {
    val df = (1L to 100L).toDF("x")
    val (a, b, c) = Overlap.par3(
      df.filter($"x" % 2 === 0).count(),
      df.filter($"x" % 2 === 1).count(),
      df.agg(org.apache.spark.sql.functions.sum($"x")).head().getLong(0))
    assert(a == 50L && b == 50L && c == 5050L)
  }

  test("a localCheckpoint taken on a pool thread serves the caller thread") {
    val (cp, n) = Overlap.par(
      (1L to 10L).toDF("x").localCheckpoint(),
      42)
    assert(n == 42)
    assert(cp.count() == 10L)
  }

  test("all: N arms return positionally; empty input returns empty") {
    assert(Overlap.all(Seq(() => 1, () => 2, () => 3)) == Seq(1, 2, 3))
    assert(Overlap.all(Seq.empty[() => Int]) == Nil)
    val counts = Overlap.all((1 to 5).map(n => () =>
      (1L to 100L).toDF("x").filter($"x" <= n * 10).count()))
    assert(counts == Seq(10L, 20L, 30L, 40L, 50L))
  }

  test("an arm's exception propagates to the caller") {
    val e = intercept[RuntimeException] {
      Overlap.par(throw new RuntimeException("arm failed"), 1)
    }
    assert(e.getMessage == "arm failed")
    // the caller-thread arm too
    val e2 = intercept[RuntimeException] {
      Overlap.par(1, throw new RuntimeException("caller arm failed"))
    }
    assert(e2.getMessage == "caller arm failed")
  }
}
