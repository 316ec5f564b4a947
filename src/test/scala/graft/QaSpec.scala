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
}
