package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import sqlContext.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asofJoin: latest at-or-before match per key; inclusive ties; unmatched -> NULL") {
    val left = Seq(
      (1L, 7L, ts(10)),  // matches right@5
      (2L, 7L, ts(20)),  // matches right@20 (tie is inclusive)
      (3L, 7L, ts(3)),   // before any right row -> NULL
      (4L, 8L, ts(10))   // other key, no right rows -> NULL
    ).toDF("id", "k", "t")
    val right = Seq(
      (7L, ts(5), "r5"), (7L, ts(20), "r20"), (7L, ts(30), "r30")
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", Map("matched" -> "v"))
      .select("id", "matched").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out == Map(1L -> "r5", 2L -> "r20", 3L -> null, 4L -> null))
  }

  test("asofJoin: right rows with NULL ts or NULL key never match (ASOF comparison semantics)") {
    import org.apache.spark.sql.types._
    val left = Seq((1L, 7L, ts(10))).toDF("id", "k", "t")
    val right = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(7L, null, "null-ts"),            // NULL ts: must not leak into unmatched rows
        Row(null, ts(5), "null-key")),       // NULL key: matches nothing
      StructType(Seq(
        StructField("k", LongType), StructField("t", TimestampType),
        StructField("v", StringType))))
    val out = Temporal.asofJoin(left, right, "k", "t", Map("m" -> "v")).collect()
    assert(out.length == 1 && out.head.getAs[String]("m") == null)
  }

  test("asofJoin: left row count preserved regardless of right history depth") {
    val left = (1 to 50).map(i => (i.toLong, 1L, ts(i))).toDF("id", "k", "t")
    val right = (1 to 500).map(i => (1L, ts(i / 10), s"v$i")).toDF("k", "t", "v")
    // dedup right per (k, t): keep first by v for determinism
    val r1 = graft.engine.Ops.firstMatch(
      right.withColumn("kt", concat(col("k"), col("t").cast("string"))), "kt", Seq(col("v")))
      .drop("kt")
    val out = Temporal.asofJoin(left, r1, "k", "t", Map("m" -> "v"))
    assert(out.count() == 50)
  }

  test("asofJoin forward: earliest at-or-after match; inclusive ties; nothing ahead -> NULL") {
    val left = Seq(
      (1L, 7L, ts(10)),  // matches right@20 (earliest >= 10)
      (2L, 7L, ts(20)),  // tie inclusive: right@20
      (3L, 7L, ts(35)),  // after all right rows -> NULL
      (4L, 8L, ts(10))   // other key -> NULL
    ).toDF("id", "k", "t")
    val right = Seq(
      (7L, ts(5), "r5"), (7L, ts(20), "r20"), (7L, ts(30), "r30")
    ).toDF("k", "t", "v")
    val out = Temporal.asofJoin(left, right, "k", "t", Map("matched" -> "v"),
      direction = "forward")
      .select("id", "matched").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out == Map(1L -> "r20", 2L -> "r20", 3L -> null, 4L -> null))
    // a NULL-ts LEFT row matches nothing in EITHER direction (NULL >= t is
    // never true); desc's default nulls-LAST ordering would otherwise hand
    // it the reversed walk's last payload
    val nullTs = Seq((9L, 7L, null.asInstanceOf[Timestamp])).toDF("id", "k", "t")
    for (dir <- Seq("backward", "forward")) {
      val r = Temporal.asofJoin(nullTs, right, "k", "t", Map("matched" -> "v"), dir)
        .select("matched").collect().head
      assert(r.isNullAt(0), s"$dir: ${r.toString}")
    }
    intercept[IllegalArgumentException](
      Temporal.asofJoin(left, right, "k", "t", Map("matched" -> "v"), "nearest"))
  }

  test("asofJoin tolerance: stale/far matches null out but the left row survives") {
    val left = Seq(
      (1L, 7L, ts(10)),   // nearest prior right@5, 5 min stale -> kept at 10m tol
      (2L, 7L, ts(60))    // nearest prior right@5, 55 min stale -> nulled
    ).toDF("id", "k", "t")
    val right = Seq((7L, ts(5), "r5")).toDF("k", "t", "v")
    val back = Temporal.asofJoin(left, right, "k", "t", Map("matched" -> "v"),
      tolerance = Some("INTERVAL 10 MINUTES"))
      .select("id", "matched").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(back == Map(1L -> "r5", 2L -> null), back.toString)
    // forward: lookahead bound
    val fwd = Temporal.asofJoin(
      Seq((1L, 7L, ts(0)), (2L, 7L, ts(4))).toDF("id", "k", "t"),
      right, "k", "t", Map("matched" -> "v"),
      direction = "forward", tolerance = Some("INTERVAL 2 MINUTES"))
      .select("id", "matched").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(fwd == Map(1L -> null, 2L -> "r5"), fwd.toString)
  }

  test("rangeJoin: only pairs inside the (exclusive, inclusive] window") {
    val l = Seq((1L, 7L, ts(0)), (2L, 7L, ts(100))).toDF("id", "k", "t")
    val r = Seq((10L, 7L, ts(0)), (11L, 7L, ts(3)), (12L, 7L, ts(5)), (13L, 7L, ts(6)))
      .toDF("id", "k", "t")
    val pairs = Temporal.rangeJoin(l, r, "k", "t", "INTERVAL 5 MINUTES")
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // ts(0) excluded (not strictly after), ts(3)/ts(5) in, ts(6) out
    assert(pairs == Set((1L, 11L), (1L, 12L)))
  }

  test("asofJoinNearest: closer side wins, ties go backward, tolerance excludes per direction") {
    val left = Seq(
      (1L, 7L, ts(10)),  // back@7 (d=3min) vs fwd@12 (d=2min) -> forward
      (2L, 7L, ts(9)),   // back@7 (d=2min) vs fwd@12 (d=3min) -> backward
      (3L, 7L, ts(30)),  // backward candidate is the LATEST at-or-before:
                         //   right@12 ("f"); no forward row -> it wins
      (4L, 8L, ts(10))   // no right rows -> NULL
    ).toDF("id", "k", "t")
    val right = Seq((7L, ts(7), "b"), (7L, ts(12), "f")).toDF("k", "t", "v")
    val out = Temporal.asofJoinNearest(left, right, "k", "t", Map("m" -> "v"))
      .select("id", "m").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out == Map(1L -> "f", 2L -> "b", 3L -> "f", 4L -> null), out.toString)
    // tie: left exactly between the two rows -> backward wins
    val tieLeft = Seq((5L, 7L, new Timestamp(ts(7).getTime + 150000L)))
      .toDF("id", "k", "t") // 2.5 min after 7, 2.5 min before 12
    val tie = Temporal.asofJoinNearest(tieLeft, right, "k", "t", Map("m" -> "v"))
      .select("m").head.getString(0)
    assert(tie == "b", "equal distance must prefer the backward match")
    // tolerance bounds BOTH directions before the distance compare
    val tol = Temporal.asofJoinNearest(
      Seq((6L, 7L, ts(9))).toDF("id", "k", "t"), right, "k", "t",
      Map("m" -> "v"), tolerance = Some("INTERVAL 1 MINUTE"))
      .select("m").head
    assert(tol.isNullAt(0),
      "1-minute bound excludes both (2min back, 3min fwd) -> NULL")
    // reserved-suffix destinations rejected
    intercept[IllegalArgumentException](
      Temporal.asofJoinNearest(left, right, "k", "t", Map("x__b" -> "v")))
  }

  test("intervalUnion: overlaps count once, touching merges, disjoint splits islands, degenerates drop") {
    def t(ms: Long) = new Timestamp(ms)
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 15L),   // overlap -> one island
      (1L, 15L, 20L),                  // touches -> same island
      (1L, 30L, 40L),                  // disjoint -> second island
      (2L, 0L, 5L),
      (2L, 5L, 5L),                    // empty: drops
      (2L, 9L, 8L))                    // negative: drops
      .map { case (k, s, e) => (k, t(s), t(e)) }
      .toDF("k", "s0", "e0")
    val r = Temporal.intervalUnion(iv, "k", "s0", "e0")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // 20ms + 10ms covered for key 1, reported in exact micros
    assert(r(1L) == (4L, 2L, 30000L), r.toString)
    assert(r(2L) == (1L, 1L, 5000L), r.toString)
  }
}
