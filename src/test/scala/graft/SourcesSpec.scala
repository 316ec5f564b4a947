package graft

import graft.engine.{Schemas, Sources}

class SourcesSpec extends SparkSpec {

  test("loadValidated: every fixture table matches its declared schema at sf0.001") {
    graft.engine.Tables.names.foreach { name =>
      val df = Sources.loadValidated(spark, "/root/testdata/sf0.001", name)
      assert(df.columns.length == Schemas.fixtureSchemas(name).fields.length)
    }
  }

  test("loadValidated: a table read under the wrong name fails fast with a column-level report") {
    val e = intercept[Sources.SchemaMismatch] {
      // read orders parquet while claiming it is lineitem
      val dir = java.nio.file.Files.createTempDirectory("graft-schema").toString
      val orders = graft.engine.Tables.load(spark, "/root/testdata/sf0.001", "orders")
      orders.write.parquet(s"$dir/lineitem.parquet")
      Sources.loadValidated(spark, dir, "lineitem")
    }
    assert(e.problems.exists(_.startsWith("missing column: l_orderkey")))
    assert(e.problems.exists(_.startsWith("unexpected column: o_orderkey")))
  }
}
