package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.engine.Qa

/** QA split/route combinators (SURVEY §2.5): partition invariants are
  * property-tested over generated key distributions (scalacheck Gens driven
  * with fixed seeds — reproducible); reason precedence and schema routing
  * pinned against the reference's null-guard behavior
  * (/root/reference/src/wins_transform_staging.py:268). */
class QaSpec extends SparkSpec {
  import sqlContext.implicits._

  /** Deterministic property loop: sample `gen` across fixed seeds. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val tagLists: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))

  test("dupSplit properties: keep ∪ rejects = input, disjoint, keep keys unique") {
    forAllSeeded(tagLists) { tags =>
      {
        val df = tags.zipWithIndex.toDF("tag", "id")
        val s = Qa.dupSplit(df, Seq("tag"), "dup")
        val keep = s.keep.select("id").as[Int].collect().toSet
        val rej = s.rejects.select("id").as[Int].collect().toSet
        assert(keep.intersect(rej).isEmpty)
        assert(keep.union(rej) == tags.indices.toSet)
        // keep side has globally unique keys
        assert(s.keep.groupBy("tag").count().filter(col("count") > 1).count() == 0)
        // every reject carries the reason
        assert(s.rejects.filter(col(Qa.FlagCol) =!= "dup").count() == 0)
      }
    }
  }

  test("refSplit properties: partition by dimension membership; NULL keys never match") {
    val dim = Seq("k1", "k2").toDF("code")
    forAllSeeded(Gen.listOfN(20, Gen.oneOf(Some("k1"), Some("k2"), Some("kX"), None))) { keys =>
      val df = keys.zipWithIndex.toDF("tag", "id")
      val s = Qa.refSplit(df, dim, "tag", "code", "nf")
      val keep = s.keep.select("id").as[Int].collect().toSet
      val rej = s.rejects.select("id").as[Int].collect().toSet
      assert(keep.intersect(rej).isEmpty)
      assert(keep.union(rej) == keys.indices.toSet)
      val expectKeep = keys.zipWithIndex.collect {
        case (Some(k), i) if k == "k1" || k == "k2" => i
      }.toSet
      assert(keep == expectKeep) // NULL and kX rows rejected
    }
  }

  test("runRules: rule 2 sees only rule 1's keep; first reason wins; routing reconciles schema") {
    // row 1: dup tag (rule 1)  — must carry rule 1's reason even though it
    //        would also fail rule 2 (the :268 null-guard behavior)
    // row 3: unique tag not in dim (rule 2)
    // row 4: unique tag in dim (keeps)
    val df = Seq(("dupX", 1), ("dupX", 2), ("lost", 3), ("k1", 4)).toDF("tag", "id")
    val seed = df.limit(0).withColumn(Qa.FlagCol, lit(""))
    val dim = Seq("k1").toDF("code")
    val out = Qa.runRules(df, seed, Seq(
      d => Qa.dupSplit(d, Seq("tag"), "Duplicate TRRR_TAG"),
      d => Qa.refSplit(d, dim, "tag", "code", "TRRR_TAG not found")))
    assert(out.keep.select("id").as[Int].collect().toSeq == Seq(4))
    val reasons = out.rejects.select("id", Qa.FlagCol).as[(Int, String)].collect().toMap
    assert(reasons == Map(
      1 -> "Duplicate TRRR_TAG", 2 -> "Duplicate TRRR_TAG", 3 -> "TRRR_TAG not found"))
  }

  test("route: NO_TEST append into a narrower reject-table schema drops extra columns") {
    val rejectTable = Seq(("t0", "r0")).toDF("tag", Qa.FlagCol)
    val batch = Seq(("t1", 99, "r1")).toDF("tag", "extra_col", Qa.FlagCol)
    val out = Qa.route(rejectTable, batch)
    assert(out.columns.toSeq == Seq("tag", Qa.FlagCol))
    assert(out.count() == 2)
  }

  test("expectations: one-pass report counts each violation class; NULL policy; requireExpectations gates") {
    import graft.engine.Qa.Expect
    val df = Seq(
      (Some(1L), Some("en"), Some(10L)),
      (Some(1L), Some("de"), Some(20L)),   // dup id
      (Some(2L), None, Some(5000L)),       // null lang
      (None, Some("fr"), Some(-3L)),       // null id + out-of-range
      (Some(3L), Some("ZZZ"), None)        // bad lang format + null n
    ).toDF("id", "lang", "n")
    val rep = Qa.expectations(df, Seq(
      Expect.notNull("lang"),
      Expect.unique("id"),
      Expect.inRange("n", 1, 1000),
      Expect.matches("lang", "^[a-z]{2}$"),
      Expect.satisfies("n_positive", col("n") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    assert(rep("not_null(lang)") == ((1L, 5L, 0)))
    // NULL-id row is skipped by unique (it is not_null's business)
    assert(rep("unique(id)") == ((1L, 5L, 0)))
    // NULL n skips in_range; -3 (below) and 5000 (above) both violate
    assert(rep("in_range(n,1.0,1000.0)") == ((2L, 5L, 0)))
    assert(rep("matches(lang)") == ((1L, 5L, 0)))
    // satisfies: NULL predicate result skips (the null-n row), -3 fails
    assert(rep("n_positive") == ((1L, 5L, 0)))
    // a clean table passes everything and the gate is silent
    val clean = Seq((1L, "en", 10L), (2L, "de", 20L)).toDF("id", "lang", "n")
    val checks = Seq(Expect.notNull("lang"), Expect.unique("id"),
      Expect.inRange("n", 1, 1000))
    assert(Qa.expectations(clean, checks).collect().forall(_.getInt(3) == 1))
    Qa.requireExpectations(clean, checks) // no throw
    val e = intercept[IllegalStateException](
      Qa.requireExpectations(df, Seq(Expect.notNull("lang"))))
    assert(e.getMessage.contains("not_null(lang)") && e.getMessage.contains("1 violations"))
    // duplicate names are ambiguous in the report -> rejected eagerly
    intercept[IllegalArgumentException](
      Qa.expectations(df, Seq(Expect.notNull("lang"), Expect.notNull("lang"))))
    // a backtick in a custom name would break the unpivot's quoted column
    // reference deep in analysis — rejected eagerly instead
    intercept[IllegalArgumentException](
      Qa.expectations(df, Seq(Expect.satisfies("len`ok", col("n") > 0))))
  }
}
