package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.6).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, compute cosine map-side, take top-k per query.
  *    This is the correctness baseline and is already the right plan when
  *    |queries| is small: one corpus scan, zero corpus shuffle before the
  *    per-query top-k.
  *  - [[annLsh]] — random-hyperplane LSH: deterministic seeded planes give
  *    every vector a sign-bit bucket; queries probe their own bucket (plus
  *    optional 1-bit-flip neighbors). Corpus side is one map-side bucket
  *    assignment + an equi-join on bucket — the 100 TB path, since the
  *    corpus never crosses the wire unbucketed.
  */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine.
    *
    * Ranking is over the cosine rounded to 6 decimals with id tie-break, so
    * results are reproducible across accumulation orders (and match the
    * DuckDB oracle bit-for-bit).
    */
  def bruteForceTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(corpusId).as("n_id"),
      VectorFns.unitizeUdf(col(corpusVec)).as("n_v"))
    val q = queries.select(col(queryId).as("q_id"),
      VectorFns.unitizeUdf(col(queryVec)).as("q_v"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", VectorFns.dotUdf(col("q_v"), col("n_v")))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "cos")
  }

  /** Deterministic random hyperplanes: `numPlanes` x `dim` weights from a
    * seeded PRNG (public knowledge construction: Charikar'02 sign-random-
    * projection LSH). */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bucket id for a double-array vector column. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      VectorFns.projectBit(vec, p) * lit(1L << i)
    }.reduce(_ + _)

  /** ANN top-k: bucket corpus and queries with the same planes, equi-join on
    * bucket, rank within the probed candidates. `probeBits` > 0 also probes
    * buckets differing in any single one of the first `probeBits` planes
    * (multi-probe: recovers near-boundary misses at the cost of probeBits
    * extra query rows — queries only, never the corpus). */
  def annLsh(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int, numPlanes: Int = 12, dim: Int = 64,
      probeBits: Int = 4, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val c = corpus.select(col(corpusId).as("n_id"),
      VectorFns.unitizeUdf(col(corpusVec)).as("n_v"))
      .withColumn("bucket", lshBucket(col("n_v"), planes))
    val q0 = queries.select(col(queryId).as("q_id"),
      VectorFns.unitizeUdf(col(queryVec)).as("q_v"))
      .withColumn("bucket", lshBucket(col("q_v"), planes))
    // base bucket plus single-bit flips of the first probeBits planes:
    val flipped = (0 until probeBits).map(i =>
      q0.withColumn("probe", expr(s"bucket ^ ${1L << i}")))
    val qAll = flipped.foldLeft(q0.withColumn("probe", col("bucket")))(_ unionByName _)
      .select("q_id", "q_v", "probe").dropDuplicates("q_id", "probe")
    val joined = c.join(broadcast(qAll), c("bucket") === qAll("probe"))
      .withColumn("cos", VectorFns.dotUdf(col("q_v"), col("n_v")))
    val w = Window.partitionBy("q_id").orderBy(round(col("cos"), 6).desc, col("n_id"))
    joined.select("q_id", "n_id", "cos").dropDuplicates("q_id", "n_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
