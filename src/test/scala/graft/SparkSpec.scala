package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (SURVEY §5.2: unit tests on local[2]). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  lazy val sqlContext = spark.sqlContext // for implicits
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checksum checkpoint manager shells out (hadoop readLink)
      // on every state-store commit; the subprocess wedges under the forked
      // test JVM in this container. Plain checkpoint files are fine here.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // static conf: managed (bucketed) test tables go to a temp warehouse
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.sql.catalogImplementation", "in-memory")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
