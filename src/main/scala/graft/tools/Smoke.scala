package graft.tools

/** Driver-smoke replica: runs SparkEntry.entry and prints its row count
  * (the driver's t1 gate checks rows > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = LocalSession.build("4")
    val df = graft.SparkEntry.entry(spark)
    df.show(20, truncate = false)
    println(s"[smoke] entry rows = ${df.count()}")
    spark.stop()
  }
}
