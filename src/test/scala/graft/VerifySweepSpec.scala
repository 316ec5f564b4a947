package graft

/** The Verify dump's chunk-barrier storage sweep: registered queries use
  * unmanaged operator variants whose internal `localCheckpoint` RDDs
  * (substringDupPairs' fingerprint barrier, substringExtent's gram table)
  * otherwise accumulate across the ~200-query dump — latent executor
  * storage growth at larger SFs. The sweep must leave the session's
  * persistent-RDD registry empty once the dump returns. */
class VerifySweepSpec extends SparkSpec {

  test("dump leaves no persistent RDDs behind after checkpoint-heavy queries") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val out = java.nio.file.Files.createTempDirectory("graft-verify-sweep").toString
    val keys = Set("dedup_substring", "substring_extent", "dedup_resolve")
    val selected = SparkEntry.queries.view.filterKeys(keys).toMap
    assert(selected.size == keys.size, "registry must carry the checkpoint-heavy keys")
    val errors = Verify.dump(spark, sfDir, out, selected, par = 2)
    assert(errors.isEmpty, s"queries failed: $errors")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keys.mkString(", ")}")
    keys.foreach { k =>
      assert(new java.io.File(s"$out/$k").exists(), s"missing output dir for $k")
    }
  }
}
