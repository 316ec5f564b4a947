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
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
