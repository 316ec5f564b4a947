package graft.tools

/** Plan auditor: prints the formatted physical plan for the named queries
  * (or all) so scan pushdown (PushedFilters/ReadSchema), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen spans can be
  * inspected — the SURVEY's "is this the plan you'd want at 100 TB" loop. */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = LocalSession.build("4")
    spark.sparkContext.setLogLevel("ERROR") // quieter than the shared WARN
    val wanted = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      graft.SparkEntry.queries.get(name).foreach { fn =>
        println(s"\n========== $name ==========")
        try fn(spark, dir).explain("formatted")
        catch { case e: Throwable => println(s"[plans] $name failed: $e") }
      }
    }
    spark.stop()
  }
}
