package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}

/** Deduplication family for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: signatures are pure map-side column expressions; the only
  * shuffles are (a) the band/bucket group-join — which is the point of LSH:
  * candidate generation without the quadratic all-pairs product — and
  * (b) the final pair dedup. All-pairs variants (jaccard/cosine) exist as
  * correctness baselines and take a blocking column to bound the product.
  */
object Dedup {

  // ------------------------------------------------------------------ exact

  /** Exact dedup via content-hash group-by: one row per distinct content,
    * keeping the smallest id (deterministic survivor), with the group size.
    * At 100 TB this is the standard single-shuffle dedup: hash first so the
    * shuffle key is 16 bytes, not the document text. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ---------------------------------------------------------------- minhash

  /** Family of hash functions indexed by i. */
  type HashFn = (Int, Column) => Column

  /** Differential-testable variant: DuckDB has md5, so the oracle can mirror
    * this exactly (lexicographic min over hex strings). */
  val md5Hash: HashFn = (i, c) => md5(concat(lit(s"$i|"), c))

  /** Production variant: 64-bit xxhash64 — 4x fewer signature bytes and no
    * hex-string materialization. Not DuckDB-mirrorable; verified against the
    * md5 variant's candidate recall in DedupSpec. */
  val xxHash: HashFn = (i, c) => xxhash64(lit(i), c)

  /** Per-doc MinHash signature columns `mh_0..mh_{k-1}` over word
    * n-gram shingles. Map-side only. */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      numHashes: Int,
      shingleN: Int = 3,
      hashFn: HashFn = xxHash): DataFrame = {
    val sh = TextFns.shingles(col(textCol), shingleN)
    val withSh = df.withColumn("__sh", sh)
    val out = (0 until numHashes).foldLeft(withSh) { (d, i) =>
      d.withColumn(s"mh_$i", array_min(transform(col("__sh"), s => hashFn(i, s))))
    }
    out.drop("__sh")
  }

  /** LSH banding: candidate pairs (a_id < b_id) that agree on at least one
    * band of `rowsPerBand` consecutive minhash values.
    *
    * The bands are EXPLODED into (band_idx, band_val) rows and self-joined
    * once on that composite key — one pass over the signatures and one
    * shuffle, rather than one join per band. Docs with no shingles (shorter
    * than the shingle width) produce NULL bands and match nothing. */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 4,
      bands: Int = 2,
      shingleN: Int = 3,
      hashFn: HashFn = xxHash): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands
    val sigs = minhashSignatures(df, textCol, numHashes, shingleN, hashFn)
    val bandCols = (0 until bands).map { j =>
      val hs = (j * r until (j + 1) * r).map(i => col(s"mh_$i").cast("string"))
      concat_ws("|", hs: _*)
    }
    // concat_ws skips NULLs: an all-NULL band (no shingles) becomes '' — map
    // it back to NULL so it cannot join.
    val banded = sigs
      .select(col(idCol), posexplode(array(bandCols: _*)).as(Seq("band_idx", "band_val")))
      .filter(col("band_val") =!= "")
    val a = banded.toDF("a_id", "band_idx", "band_val")
    val b = banded.toDF("b_id", "band_idx", "band_val")
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes. Pure map-side SQL-lambda expression (no UDF). */
  def simhash(df: DataFrame, textCol: String, shingleN: Int = 1): DataFrame = {
    val sh = if (shingleN == 1) TextFns.tokens(col(textCol))
             else TextFns.shingles(col(textCol), shingleN)
    df.withColumn("__hs", transform(sh, s => xxhash64(s)))
      .withColumn("simhash", expr(
        """aggregate(
          |  transform(sequence(0, 63),
          |    b -> aggregate(__hs, 0L,
          |           (acc, h) -> acc + CASE WHEN (h >> b) & 1 = 1 THEN 1L ELSE -1L END)),
          |  named_struct('acc', 0L, 'b', 0),
          |  (s, v) -> named_struct(
          |    'acc', s.acc + CASE WHEN v > 0 THEN shiftleft(1L, s.b) ELSE 0L END,
          |    'b', s.b + 1),
          |  s -> s.acc)""".stripMargin))
      .drop("__hs")
  }

  /** SimHash near-dup candidates: 4 chunks of 16 bits — any pair within
    * Hamming distance 3 shares at least one exact chunk (pigeonhole). The
    * chunk join is the LSH; the optional `maxHamming` reranks candidates on
    * the true distance via bit_count(xor). */
  def simhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      shingleN: Int = 1): DataFrame = {
    val sigs = simhash(df, textCol, shingleN).select(col(idCol), col("simhash"))
    val chunks = (0 until 4).map(i =>
      struct(lit(i).as("chunk_idx"),
        shiftrightunsigned(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL)).as("chunk_val")))
    val exploded = sigs.select(col(idCol), col("simhash"), explode(array(chunks: _*)).as("c"))
      .select(col(idCol), col("simhash"), col("c.chunk_idx"), col("c.chunk_val"))
    val a = exploded.toDF("a_id", "a_sim", "chunk_idx", "chunk_val")
    val b = exploded.toDF("b_id", "b_sim", "chunk_idx", "chunk_val")
    a.join(b, Seq("chunk_idx", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sim").bitwiseXOR(col("b_sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ----------------------------------------------------------- ngram jaccard

  /** N-gram Jaccard similarity for pairs sharing at least one shingle:
    * explode distinct shingles, self-join on shingle, count intersections,
    * and compute |A∩B| / (|A|+|B|-|A∩B|).
    *
    * `maxShingleDf` drops shingles occurring in more than that many docs
    * before the join — the standard skew guard: a stop-shingle shared by a
    * million docs would otherwise create a quadratic hot key. Candidate
    * recall for pairs above `minJaccard` is unaffected for thresholds where
    * rare shingles dominate (verified in DedupSpec). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      minJaccard: Double = 0.5,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFns.shingles(col(textCol), shingleN))).as("s"))
    val filtered = maxShingleDf match {
      case Some(m) =>
        import org.apache.spark.sql.expressions.Window
        sh.withColumn("__df", count(lit(1)).over(Window.partitionBy("s")))
          .filter(col("__df") <= m).drop("__df")
      case None => sh
    }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = filtered.toDF("a_id", "s")
    val b = filtered.toDF("b_id", "s")
    val inter = a.join(b, "s").filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).cast("double").as("i"))
    inter
      .join(sizes.toDF("a_id", "na"), "a_id")
      .join(sizes.toDF("b_id", "nb"), "b_id")
      .withColumn("jaccard", col("i") / (col("na") + col("nb") - col("i")))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  // ------------------------------------------------------- embedding cosine

  /** Embedding-cosine near-duplicate pairs above a threshold. This is the
    * exact (quadratic) baseline: an optional blocking column bounds the
    * product; the scale path is [[Similarity.annLsh]] bucketing. */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      blockCol: Option[String] = None): DataFrame = {
    val e = df.select(
      col(idCol).as("id"),
      VectorFns.toDoubles(col(vecCol)).as("v"),
      (blockCol.map(col).getOrElse(lit(0))).as("blk"))
    val a = e.toDF("a_id", "a_v", "blk")
    val b = e.toDF("b_id", "b_v", "blk")
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", VectorFns.cosine(col("a_v"), col("b_v")))
      .filter(col("cos") >= minCosine)
      .select("a_id", "b_id", "cos")
  }
}
