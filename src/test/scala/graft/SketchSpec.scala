package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates have no DuckDB twin (algorithms differ per engine);
  * the contract is accuracy against the exact values on the fixtures. */
class SketchSpec extends SparkSpec {

  private lazy val li =
    graft.engine.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_count_distinct within 5% of exact per group") {
    val rows = li.groupBy("l_returnflag").agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (e, a) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }

  test("percentile_approx within 1% of the exact median per group") {
    val rows = li.groupBy("l_returnflag").agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .collect()
    rows.foreach { r =>
      val (e, a) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.01, s"${r.getString(0)}: exact=$e approx=$a")
    }
  }
}
