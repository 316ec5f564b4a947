package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Ops
import graft.operators.{Curation, Dedup}

/** Algebraic contracts property-tested over generated inputs (fixed seeds —
  * reproducible, same discipline as QaSpec): the merge/diff/split/dedup
  * operators promise laws (idempotence, partition, round-trip identity)
  * that unit fixtures alone cannot pin across input shapes. */
class AlgebraSpec extends SparkSpec {
  import sqlContext.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  // keyed rows with a small key space (collisions guaranteed) and a payload
  private val keyedRows: Gen[List[(Long, String, Long)]] =
    Gen.listOfN(25, for {
      k <- Gen.choose(1L, 8L)
      v <- Gen.oneOf("a", "b", "c", "d")
      s <- Gen.choose(1L, 100L)
    } yield (k, v, s))

  test("upsert is idempotent: applying the same update batch twice equals once") {
    forAllSeeded(keyedRows) { rows =>
      // unique keys per side (upsert's documented precondition)
      val base = rows.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "v", "s")
      val ups = rows.reverse.groupBy(_._1).map(_._2.head).take(5).toSeq.toDF("k", "v", "s")
      val once = Ops.upsert(base, ups, Seq("k"))
      val twice = Ops.upsert(once, ups, Seq("k"))
      val a = once.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val b = twice.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(a == b)
      // and the result's keys are exactly base.keys ∪ ups.keys
      val keys = a.map(_._1)
      assert(keys == (base.collect().map(_.getLong(0)) ++ ups.collect().map(_.getLong(0))).toSet)
    }
  }

  test("applyCdc: deletes leave no trace, re-applying the same change batch is a no-op") {
    forAllSeeded(keyedRows) { rows =>
      val base = rows.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "v", "s")
      // one change row per key: first half delete, second half upsert
      val changes = rows.groupBy(_._1).map(_._2.head).zipWithIndex.map {
        case ((k, v, s), i) => (k, v + "!", s, if (i % 2 == 0) "D" else "U")
      }.toSeq.toDF("k", "v", "s", "op")
      val once = Ops.applyCdc(base, changes, Seq("k"), "op")
      val twice = Ops.applyCdc(once, changes, Seq("k"), "op")
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(m(once) == m(twice))
      val deleted = changes.filter(col("op") === "D").select("k").as[Long].collect().toSet
      assert(m(once).keySet.intersect(deleted).isEmpty)
    }
  }

  test("snapshotDiff laws: diff(x, x) is all-unchanged; a per-row edit flips exactly that row") {
    forAllSeeded(keyedRows) { rows =>
      val x = rows.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "v", "s")
      val self = Curation.snapshotDiff(x, x, "k", Seq("v", "s"))
        .collect().map(r => r.getString(1)).toSet
      assert(self == Set("unchanged") || self.isEmpty)
      val edited = x.withColumn("v",
        when(col("k") === x.collect().head.getLong(0), concat(col("v"), lit("~")))
          .otherwise(col("v")))
      val d = Curation.snapshotDiff(x, edited, "k", Seq("v", "s"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(d.values.count(_ == "changed") == 1)
      assert(d(x.collect().head.getLong(0)) == "changed")
    }
  }

  test("dedupLines round-trips any corpus byte-exact when no segment is over-frequent") {
    val corpora: Gen[List[(Long, String)]] =
      Gen.listOfN(8, Gen.listOfN(4,
        Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon zeta")).map(_.mkString("\n")))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    forAllSeeded(corpora) { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = Dedup.dedupLines(df, "doc_id", "text", sep = "\n",
          maxDocFreq = docs.size.toLong)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == docs.toMap)
    }
  }

  test("asofJoin directions are time-reversal duals: forward(t) == backward(-t) on any input") {
    import graft.operators.Temporal
    val gen = for {
      lefts <- Gen.listOfN(15, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
      rights <- Gen.listOfN(10, Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 50L)))
    } yield (lefts.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
      // unique (key, ts) on the right (the operator's contract)
      rights.distinct.map { case (k, t) => (k, t, s"v$k-$t") })
    forAllSeeded(gen) { case (lefts, rights) =>
      val l = lefts.toDF("id", "k", "t")
      val r = rights.toDF("k", "t", "v")
      val fwd = Temporal.asofJoin(l, r, "k", "t", Map("m" -> "v"), "forward")
        .collect().map(x => x.getLong(0) -> x.get(3)).toMap
      // negate time on both sides: the earliest at-or-after becomes the
      // latest at-or-before — the two walks must agree exactly
      val ln = l.withColumn("t", -col("t"))
      val rn = r.withColumn("t", -col("t"))
      val backNeg = Temporal.asofJoin(ln, rn, "k", "t", Map("m" -> "v"), "backward")
        .collect().map(x => x.getLong(0) -> x.get(3)).toMap
      assert(fwd == backNeg, s"$fwd vs $backNeg")
    }
  }

  test("assignSplits partitions completely: every non-null id draws exactly one declared split") {
    forAllSeeded(Gen.listOfN(40, Gen.choose(1L, 1000000L))) { ids =>
      val cuts = Seq("train" -> 70, "val" -> 20, "test" -> 10)
      val out = Curation.assignSplits(ids.toDF("id"), "id", cuts)
        .collect().map(r => r.getLong(0) -> r.getString(1))
      assert(out.forall { case (_, s) => cuts.exists(_._1 == s) })
      // hash-stable: the same id never lands in two splits
      assert(out.groupBy(_._1).values.forall(_.map(_._2).distinct.size == 1))
    }
  }
}
