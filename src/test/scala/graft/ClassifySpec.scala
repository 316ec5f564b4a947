package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Hashed-feature multinomial Naive Bayes: model counts exact,
  * classification argmax hand-verified, OOV smoothing, deterministic
  * tie-break, learn-once/apply-many contract. */
class ClassifySpec extends SparkSpec {
  import sqlContext.implicits._

  private def feat(w: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(3)

  test("nbTrain: exact (label, feature) counts with per-label doc counts; unlabeled rows excluded") {
    val train = Seq(
      (Some("A"), Some("x x y")), (Some("A"), Some("x")),
      (Some("B"), Some("z z")),
      (None, Some("x x x x")),       // unlabeled: cannot supervise
      (Some("B"), None))             // no text: nothing to count
      .toDF("lang", "text")
    // fixture words must hash-collide-free at 3 hex chars
    assert(Seq("x", "y", "z").map(feat).distinct.size == 3)
    val m = Classify.nbTrain(train, "lang", "text")
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m == Map(
      ("A", feat("x")) -> (3L, 2L),
      ("A", feat("y")) -> (1L, 2L),
      ("B", feat("z")) -> (2L, 1L)), m.toString)
    intercept[IllegalArgumentException](
      Classify.nbTrain(train, "lang", "text", hexChars = 0))
  }

  test("nbClassify: hand-computed argmax, OOV docs route by prior instead of dropping, zero-token docs emit no row") {
    val train = Seq(("A", "x x y"), ("A", "x"), ("B", "z z"))
      .toDF("lang", "text")
    val model = Classify.nbTrain(train, "lang", "text")
    val batch = Seq(
      (10L, "x y"),      // A vocabulary
      (11L, "z"),        // B vocabulary
      (12L, "qq"),       // fully OOV: prior decides (A has 2 docs, B has 1)
      (13L, "  "),       // zero tokens: no row
      (14L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Classify.nbClassify(batch, "doc_id", "text", model)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getString(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(10L, 11L, 12L), got.toString)
    assert(got(10L)._2 == "A" && got(10L)._1 == 2L, got.toString)
    assert(got(11L)._2 == "B" && got(11L)._1 == 1L, got.toString)
    assert(got(12L)._2 == "A" && got(12L)._1 == 1L, got.toString)
    // hand-computed posterior for doc 10 under A:
    // ln(2/3) + ln((3+1)/(4+4096)) + ln((1+1)/(4+4096)), round-4
    val expected = BigDecimal(
        math.log(2.0 / 3) + math.log(4.0 / 4100) + math.log(2.0 / 4100))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(10L)._3 == expected, s"${got(10L)._3} != $expected")
    intercept[IllegalArgumentException](
      Classify.nbClassify(batch, "doc_id", "text",
        model.withColumnRenamed("n_feat", "wrong")))
  }

  test("nbClassify: exact score ties break on the lexicographically smallest label") {
    // symmetric classes: one doc each, one token each -> identical priors
    // and identical smoothed likelihoods for an OOV token
    val train = Seq(("B", "y"), ("A", "x")).toDF("lang", "text")
    val model = Classify.nbTrain(train, "lang", "text")
    val got = Classify.nbClassify(
        Seq((1L, "unseen")).toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => (r.getString(2), r.getDouble(3)))
    assert(got.length == 1 && got.head._1 == "A", got.mkString(","))
  }

  test("writeNbModel/readNbModel: round-trip scores identically; hexChars rides in the artifact; swap recovery") {
    val train = Seq(("A", "x x y"), ("A", "x"), ("B", "z z"))
      .toDF("lang", "text")
    val batch = Seq((1L, "x x"), (2L, "z"), (3L, "unseen word"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try {
      Classify.writeNbModel(train, "lang", "text", dir, hexChars = 4)
      val (model, hexChars) = Classify.readNbModel(spark, dir)
      assert(hexChars == 4, "hexChars must round-trip in the artifact")
      assert(!new java.io.File(dir + ".tmp").exists &&
        !new java.io.File(dir + ".old").exists, "publish must leave no debris")
      def res(m: org.apache.spark.sql.DataFrame, h: Int) =
        Classify.nbClassify(batch, "doc_id", "text", m, h)
          .collect().map(r =>
            (r.getLong(0), r.getString(2), r.getDouble(3))).toSet
      val stored = res(model, hexChars)
      val mem = res(Classify.nbTrain(train, "lang", "text", 4), 4)
      assert(stored == mem, s"stored $stored != in-memory $mem")
      // republish overwrites atomically and still answers
      Classify.writeNbModel(train.limit(2), "lang", "text", dir, hexChars = 3)
      val (m2, h2) = Classify.readNbModel(spark, dir)
      assert(h2 == 3 && m2.count() > 0)
      // crash window: root renamed to .old, second rename never ran —
      // the next read must recover the previous artifact, data intact
      require(fs.rename(root, new org.apache.hadoop.fs.Path(dir + ".old")))
      val (m3, h3) = Classify.readNbModel(spark, dir)
      assert(h3 == 3 && m3.count() == m2.count(),
        "swap recovery must restore the prior artifact")
    } finally fs.delete(root, true)
  }
}
