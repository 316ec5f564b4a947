package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.engine.Ops

/** Pins the sharp-edge semantics of SURVEY §2.2-§2.4 / §7.3 — especially the
  * arcpy behaviors that differ from the "obvious" Spark translation. */
class OpsSpec extends SparkSpec {
  import sqlContext.implicits._

  test("appendNoTest: missing target columns null-filled, extra source columns dropped") {
    val target = Seq(("t1", "a", 1)).toDF("tag", "descr", "n")
    val src = Seq(("s1", 9, "junk")).toDF("tag", "n", "extra")
    val out = Ops.appendNoTest(target, src)
    assert(out.columns.toSeq == Seq("tag", "descr", "n"))
    val rows = out.orderBy("tag").collect().toSeq
    assert(rows == Seq(Row("s1", null, 9), Row("t1", "a", 1)))
  }

  test("appendNoTest: column names match case-insensitively (NO_TEST / unionByName rules)") {
    val target = Seq(("t1", "a")).toDF("TRRR_TAG", "descr")
    val src = Seq(("s1", "b")).toDF("trrr_tag", "DESCR")
    val out = Ops.appendNoTest(target, src).orderBy("TRRR_TAG").collect().toSeq
    assert(out == Seq(Row("s1", "b"), Row("t1", "a")))
  }

  test("appendNoTest: source columns differing only in case fail fast with an explicit message") {
    val target = Seq(("t1", "a")).toDF("tag", "descr")
    val src = Seq(("s1", "S1", "b")).toDF("TAG", "Tag", "descr")
    val e = intercept[IllegalArgumentException](Ops.appendNoTest(target, src))
    assert(e.getMessage.contains("differ only in case") && e.getMessage.contains("TAG/Tag"))
  }

  test("calcWhen: only selected rows assigned; ordered rules leave non-matching rows' prior value") {
    // reference :168-171 — RV% then RS%; a tag matching neither keeps its
    // appended FEATURE_CODE
    val df = Seq(("RV1", "old"), ("RS2", "old"), ("XX3", "old"))
      .toDF("TRRR_TAG", "FEATURE_CODE")
    val r1 = Ops.calcWhen(df, "FEATURE_CODE", col("TRRR_TAG").like("RV%"), lit("EA83030000"))
    val r2 = Ops.calcWhen(r1, "FEATURE_CODE", col("TRRR_TAG").like("RS%"), lit("EA83040000"))
    assert(r2.orderBy("TRRR_TAG").collect().toSeq == Seq(
      Row("RS2", "EA83040000"), Row("RV1", "EA83030000"), Row("XX3", "old")))
  }

  test("blankToNull: '' becomes NULL; NULL and populated values untouched") {
    val df = Seq(Some(""), Some("x"), None).toDF("tag")
    val out = Ops.blankToNull(df, "tag").collect().map(_.get(0)).toSet
    assert(out == Set(null, "x"))
    assert(Ops.blankToNull(df, "tag").filter(col("tag").isNull).count() == 2)
  }

  test("deleteWhere: NULL-predicate rows survive (SQL where semantics)") {
    val df = Seq(Some(40.0), Some(10.0), None).toDF("v")
    val out = Ops.deleteWhere(df, col("v") > 30).collect().map(_.get(0)).toSet
    assert(out == Set(10.0, null)) // 40 deleted; NULL row kept
  }

  test("firstMatch: duplicate right keys reduced to row_number()==1 over explicit order") {
    val right = Seq(("k1", "b", 2), ("k1", "a", 1), ("k2", "c", 3)).toDF("key", "v", "oid")
    val out = Ops.firstMatch(right, "key", Seq(col("oid"))).orderBy("key")
      .select("key", "v").collect().toSeq
    assert(out == Seq(Row("k1", "a"), Row("k2", "c")))
  }

  test("joinEnrich: left row count never multiplies; copy OVERWRITES prior value incl. NULL for unmatched") {
    // reference :176-179 — CalculateField after KEEP_ALL writes the joined
    // value into EVERY left row; unmatched rows get NULL, not their old value
    val left = Seq(("k1", "prior1"), ("k3", "prior3")).toDF("tag", "DESCRIPTION")
    val right = Seq(("k1", "d1", 1), ("k1", "d2", 2)).toDF("code", "PNTS_DESCR", "oid")
    val out = Ops.joinEnrich(left, right, "tag", "code",
      rightOrder = Seq(col("oid")), copies = Map("DESCRIPTION" -> "PNTS_DESCR"))
    assert(out.count() == 2) // dup right keys don't multiply
    val m = out.collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(m("k1") == "d1")  // first match by oid
    assert(m("k3") == null)  // overwrite, NOT coalesce
  }

  test("joinEnrich: rightOrder may reference columns outside the copied set") {
    // regression: ordering column (OID) pruned away before firstMatch
    val left = Seq(("k1", "x")).toDF("tag", "dst")
    val right = Seq(("k1", "late", 9), ("k1", "early", 1)).toDF("code", "v", "OID")
    val out = Ops.joinEnrich(left, right, "tag", "code",
      rightOrder = Seq(col("OID")), copies = Map("dst" -> "v"))
    assert(out.collect().head.getString(1) == "early")
  }

  test("frequency: multi-key count + summary sums, FREQUENCY is int64") {
    val df = Seq(("a", "x", 1.0), ("a", "x", 2.0), ("b", "y", 3.0)).toDF("k1", "k2", "v")
    val out = Ops.frequency(df, Seq("k1", "k2"), Seq("v")).orderBy("k1").collect().toSeq
    assert(out == Seq(Row("a", "x", 2L, 3.0), Row("b", "y", 1L, 3.0)))
  }

  test("upsert: whole-row replace (update NULL nulls the target), insert, untouched base row") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "name", "v")
    val updates = Seq((2L, null.asInstanceOf[String], 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val out = Ops.upsert(base, updates, Seq("k")).orderBy("k").collect().toSeq
    // key 2: WHOLE ROW replaced — name becomes NULL, not coalesced back to "b"
    assert(out == Seq(Row(1L, "a", 10.0), Row(2L, null, 99.0),
      Row(3L, "c", 30.0), Row(4L, "d", 40.0)))
  }

  test("upsert: column order insensitive; schema mismatch fails fast") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val reordered = Seq(("z", 1L)).toDF("name", "k")
    assert(Ops.upsert(base, reordered, Seq("k")).collect().toSeq == Seq(Row(1L, "z")))
    val bad = Seq((1L, "a", 0.0)).toDF("k", "name", "extra")
    val e = intercept[IllegalArgumentException](Ops.upsert(base, bad, Seq("k")))
    assert(e.getMessage.contains("identical schemas"))
  }

  test("applyCdc: deletes remove keys, other ops (incl. NULL) upsert, op column never lands") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name")
    val changes = Seq(
      (2L, "ignored", "D"),                      // delete key 2
      (3L, "C", null.asInstanceOf[String]),      // NULL op -> upsert
      (4L, "d", "i")                             // lowercase insert op
    ).toDF("k", "name", "op")
    val out = Ops.applyCdc(base, changes, Seq("k")).orderBy("k").collect().toSeq
    assert(out == Seq(Row(1L, "a"), Row(3L, "C"), Row(4L, "d")))
    // deleting a never-seen key is a no-op, not an error or a ghost row
    val delMissing = Seq((99L, "x", "d")).toDF("k", "name", "op")
    assert(Ops.applyCdc(base, delMissing, Seq("k")).count() == 3)
    // missing op column names itself
    val e = intercept[IllegalArgumentException](
      Ops.applyCdc(base, base, Seq("k"), opCol = "op"))
    assert(e.getMessage.contains("'op'"))
  }

  test("scd2Apply: versions close and open correctly; history untouched; out-of-order feed fails fast") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dim = Seq(
      // key 1: one closed + one current version
      (1L, "v1", ts("2026-01-01 00:00:00"), ts("2026-03-01 00:00:00"), false),
      (1L, "v2", ts("2026-03-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true),
      // key 2: a single current version that this batch does not touch
      (2L, "w1", ts("2026-02-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp], true)
    ).toDF("k", "name", "valid_from", "valid_to", "is_current")
    val changes = Seq(
      (1L, "v3", ts("2026-08-01 00:00:00")),  // new version of key 1
      (3L, "x1", ts("2026-08-01 00:00:00"))   // brand-new key
    ).toDF("k", "name", "eff")
    val out = Ops.scd2Apply(dim, changes, Seq("k"), "eff")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "v1", ts("2026-01-01 00:00:00"), Some(ts("2026-03-01 00:00:00")), false),
      (1L, "v2", ts("2026-03-01 00:00:00"), Some(ts("2026-08-01 00:00:00")), false),
      (1L, "v3", ts("2026-08-01 00:00:00"), None, true),
      (2L, "w1", ts("2026-02-01 00:00:00"), None, true),
      (3L, "x1", ts("2026-08-01 00:00:00"), None, true)), out.mkString("\n"))
    // exactly one current version per key survives a second application
    val again = Ops.scd2Apply(out.toDF("k", "name", "valid_from", "valid_to", "is_current"),
      Seq((2L, "w2", ts("2026-09-01 00:00:00"))).toDF("k", "name", "eff"),
      Seq("k"), "eff")
    val currents = again.filter(col("is_current")).groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(currents == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a replayed old batch (effective <= current valid_from) fails loudly
    val stale = Seq((1L, "old", ts("2026-03-01 00:00:00"))).toDF("k", "name", "eff")
    val e = intercept[Exception](Ops.scd2Apply(dim, stale, Seq("k"), "eff").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("out-of-order feed")), msgs(e).mkString("\n"))
    // a NULL effective timestamp fails loudly for BOTH an existing key
    // (where it would leave two open versions) and a brand-new key (which
    // never reaches the closed join and would open with NULL valid_from)
    for (key <- Seq(1L, 99L)) {
      val nullEff = Seq((key, "x", null.asInstanceOf[java.sql.Timestamp]))
        .toDF("k", "name", "eff")
      val eN = intercept[Exception](Ops.scd2Apply(dim, nullEff, Seq("k"), "eff").collect())
      assert(msgs(eN).exists(_.contains("effective timestamp")), msgs(eN).mkString("\n"))
    }
  }

  test("upsert: validateKeys rejects duplicate keys on either side") {
    val base = Seq((1L, "a"), (1L, "a2"), (2L, "b")).toDF("k", "name")
    val updates = Seq((2L, "B")).toDF("k", "name")
    val e = intercept[IllegalArgumentException](
      Ops.upsert(base, updates, Seq("k"), validateKeys = true))
    assert(e.getMessage.contains("unique keys") && e.getMessage.contains("base"))
    val e2 = intercept[IllegalArgumentException](
      Ops.upsert(updates, base, Seq("k"), validateKeys = true))
    assert(e2.getMessage.contains("updates"))
    // clean sides pass validation and merge normally
    val ok = Ops.upsert(Seq((1L, "a")).toDF("k", "name"), updates, Seq("k"),
      validateKeys = true).orderBy("k").collect().toSeq
    assert(ok == Seq(Row(1L, "a"), Row(2L, "B")))
  }

  test("bloom persistence: a reloaded filter prefilters identically to the in-memory build") {
    val dim = (1L to 500L).filter(_ % 3 == 0).toDF("k")
    val fact = (1L to 500L).map(i => (i, s"row$i")).toDF("k", "v")
    val bf = Ops.buildBloom(dim, "k", expectedItems = 200)
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    Ops.saveBloom(spark, bf, s"$dir/dim.bloom")
    val re = Ops.loadBloom(spark, s"$dir/dim.bloom")
    val direct = Ops.bloomPrefilter(fact, "k", bf).select("k").as[Long].collect().toSet
    val loaded = Ops.bloomPrefilter(fact, "k", re).select("k").as[Long].collect().toSet
    assert(loaded == direct, s"${loaded.size} vs ${direct.size}")
    // no false negatives: every real dim key survives the prefilter
    assert((1L to 500L).filter(_ % 3 == 0).toSet.subsetOf(loaded))
    // NULL keys drop (semi-join semantics)
    val withNull = Seq(Option.empty[java.lang.Long], Some(java.lang.Long.valueOf(3L)))
      .toDF("k")
    assert(Ops.bloomPrefilter(withNull, "k", re).count() == 1)
    // overwrite is atomic-by-rename and idempotent
    Ops.saveBloom(spark, bf, s"$dir/dim.bloom")
    assert(Ops.bloomPrefilter(fact, "k", Ops.loadBloom(spark, s"$dir/dim.bloom"))
      .count() == direct.size)
  }
}
