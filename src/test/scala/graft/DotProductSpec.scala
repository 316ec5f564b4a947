package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Native Catalyst DotProduct: bit-equality with the UDF twin, codegen
  * participation, and SQL registration through GraftExtensions. */
class DotProductSpec extends SparkSpec {

  test("dotNative == dotUdf bit-for-bit on the fixture embeddings") {
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), VectorFns.unitizeUdf(col("embedding")).as("v"))
    val a = e.toDF("a_id", "a_v")
    val b = e.toDF("b_id", "b_v")
    val pairs = a.join(b, col("a_id") < col("b_id")).limit(5000)
    val diff = pairs
      .withColumn("d1", VectorFns.dotNative(col("a_v"), col("b_v")))
      .withColumn("d2", VectorFns.dotUdf(col("a_v"), col("b_v")))
      .filter(col("d1") =!= col("d2")) // exact comparison, not tolerance
      .count()
    assert(diff == 0)
  }

  test("expression is codegen'd (no ScalaUDF in the projection plan)") {
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(VectorFns.unitizeUdf(col("embedding")).as("v"))
    val plan = e.select(VectorFns.dotNative(col("v"), col("v")).as("d"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_dot"), plan)
    val projLine = plan.linesIterator.find(_.contains("graft_dot")).get
    assert(!projLine.toLowerCase.contains("scalaudf"), projLine)
  }

  test("two DotProducts in one projection codegen cleanly (freshName locals)") {
    import sqlContext.implicits._
    // non-nullable array children: nullSafeCodeGen inlines without an
    // if-block, so duplicated local names would collide in one method scope
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    val r = df.select(
      VectorFns.dotNative(col("a"), col("b")).as("d1"),
      VectorFns.dotNative(col("a"), col("a")).as("d2")).head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0)
  }

  test("aggregator and window top-k agree even with a degenerate zero vector (NaN cosine)") {
    import sqlContext.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f)), // zero norm -> NaN cosine against everything
      (4L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "n_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val win = rows(graft.operators.Similarity.bruteForceTopK(
      vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 4))
    val agg = rows(graft.operators.TopK.bruteForceTopKAgg(
      vecs, "vec_id", "embedding", q, "vec_id", "embedding", k = 4))
    assert(agg == win) // incl. the NaN row's position
  }

  test("unitizeNative == unitizeUdf bit-for-bit on the fixture embeddings; NaN zero-vector parity") {
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val diff = e.select(
        VectorFns.unitizeNative(col("embedding")).as("u1"),
        VectorFns.unitizeUdf(col("embedding")).as("u2"))
      .filter(col("u1") =!= col("u2")) // array equality, exact not tolerance
      .count()
    assert(diff == 0)
    import sqlContext.implicits._
    // a zero vector divides 0/0 in both paths: elementwise NaN, not an error
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("embedding")
      .select(VectorFns.unitizeNative(col("embedding")).as("u"))
      .head().getSeq[Double](0)
    assert(z.forall(_.isNaN))
  }

  test("unitizeNative is codegen'd and keeps the whole projection UDF-free") {
    val e = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = e.select(VectorFns.unitizeNative(col("embedding")).as("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_unitize"), plan)
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // composed with graft_dot: the full similarity projection stays native
    val both = e.select(VectorFns.dotNative(
        VectorFns.unitizeNative(col("embedding")),
        VectorFns.unitizeNative(col("embedding"))).as("d"))
    assert(!both.queryExecution.executedPlan.toString.toLowerCase.contains("scalaudf"))
    // and evaluates: unit vector dotted with itself is 1 (to fp rounding)
    assert(math.abs(both.head().getDouble(0) - 1.0) < 1e-12)
  }

  test("graft_dot registered for SQL via GraftExtensions") {
    val prev = spark // keep the shared session restorable
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[1]")
        .appName("graft-ext-test")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val d = s2.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
      // graft_unitize rides the same extension (3-4-5 triangle normalizes)
      val u = s2.sql("SELECT graft_unitize(array(3.0D, 4.0D)) AS u")
        .head().getSeq[Double](0)
      assert(u == Seq(0.6, 0.8))
      // graft_nfc rides the same extension: decomposed e+U+0301 composes
      val n = s2.sql("SELECT graft_nfc('café') AS n").head().getString(0)
      assert(n == "café")
      // graft_shingles rides the same extension (width as an INT literal)
      val sh = s2.sql("SELECT graft_shingles('a b c d', 2) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b", "b c", "c d"))
      // the ApproxDistinctRule rides the same extension: OFF by default
      // (exact distinct plan — Spark regroups on the distinct value, a
      // second full Exchange), ON rewrites to HLL++ (single-pass sketch,
      // estimate within the 2% rsd of the true 1000 with wide margin)
      import s2.implicits._
      val wide = (1 to 5000).map(i => (i % 1000, i)).toDF("k", "v")
      val exactPlan = wide.select(countDistinct(org.apache.spark.sql.functions.col("k")))
        .queryExecution.executedPlan.toString
      assert(exactPlan.contains("count(distinct"), exactPlan)
      assert(wide.select(countDistinct(org.apache.spark.sql.functions.col("k")))
        .head().getLong(0) == 1000L)
      s2.conf.set("spark.graft.approxDistinct", "true")
      try {
        val q = wide.select(countDistinct(org.apache.spark.sql.functions.col("k")))
        val approxPlan = q.queryExecution.executedPlan.toString
        assert(!approxPlan.contains("count(distinct"), approxPlan)
        assert(approxPlan.contains("approx_count_distinct")
          || approxPlan.toLowerCase.contains("hyperloglog"), approxPlan)
        val est = q.head().getLong(0)
        assert(math.abs(est - 1000L) <= 100L, s"estimate $est")
        // plain count and multi-column distinct keep exact semantics
        assert(wide.select(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.col("k"))).head().getLong(0) == 5000L)
        assert(wide.select(countDistinct(
          org.apache.spark.sql.functions.col("k"),
          org.apache.spark.sql.functions.col("v"))).head().getLong(0) == 5000L)
      } finally s2.conf.set("spark.graft.approxDistinct", "false")
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
