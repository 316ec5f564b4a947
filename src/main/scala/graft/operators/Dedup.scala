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

  /** Hash family for minhash signatures. */
  sealed trait HashFamily
  /** md5 hex strings with an `"i|"` prefix per hash index — DuckDB can
    * mirror this exactly (lexicographic min over hex strings), so the
    * differential oracle uses it. */
  case object Md5Family extends HashFamily
  /** 64-bit FNV-1a with the same prefixing — the fast production default
    * (no cryptographic digest per shingle). Verified against Md5Family's
    * candidate behavior in DedupSpec. */
  case object Fnv64Family extends HashFamily

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = "0123456789abcdef"
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < b.length) {
      sb.append(hex.charAt((b(i) >> 4) & 0xf)).append(hex.charAt(b(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  /** One UDF computes the k per-hash minima AND folds them into the b band
    * values — a single JVM pass per document. (The earlier higher-order-
    * expression formulation evaluated k interpreted array passes per doc:
    * 5.6s at sf0.1 vs ~1s for this form. A single band-array output also
    * guarantees one evaluation — k separate signature columns over one UDF
    * invite Catalyst to duplicate the call per projection.)
    * Returns null when the doc has no shingles -> explode emits nothing ->
    * the doc matches no one, same as the oracle's empty-list list_min. */
  private def bandsUdf(numHashes: Int, bands: Int, shingleN: Int, family: HashFamily) = {
    val r = numHashes / bands
    udf { (text: String) =>
      if (text == null) null
      else {
        val toks = text.split(" ", -1)
        if (toks.length < shingleN) null
        else {
          val mins = Array.fill(numHashes)(null: String)
          var t = 0
          val last = toks.length - shingleN
          while (t <= last) {
            val s = if (shingleN == 1) toks(t) else toks.slice(t, t + shingleN).mkString(" ")
            var i = 0
            while (i < numHashes) {
              val h = family match {
                case Md5Family => md5hex(i.toString + "|" + s)
                case Fnv64Family => java.lang.Long.toHexString(fnv64(i.toString + "|" + s))
              }
              if (mins(i) == null || h < mins(i)) mins(i) = h
              i += 1
            }
            t += 1
          }
          Array.tabulate(bands)(j => mins.slice(j * r, (j + 1) * r).mkString("|"))
        }
      }
    }
  }

  /** Per-doc MinHash signature columns `mh_0..mh_{k-1}` over word n-gram
    * shingles (bands of width 1 from [[bandsUdf]]). Map-side only. */
  def minhashSignatures(
      df: DataFrame,
      textCol: String,
      numHashes: Int,
      shingleN: Int = 3,
      family: HashFamily = Fnv64Family): DataFrame = {
    val arr = bandsUdf(numHashes, numHashes, shingleN, family)(col(textCol))
    val withArr = df.withColumn("__mhs", arr)
    (0 until numHashes).foldLeft(withArr) { (d, i) =>
      d.withColumn(s"mh_$i", element_at(col("__mhs"), i + 1))
    }.drop("__mhs")
  }

  /** LSH banding: candidate pairs (a_id < b_id) that agree on at least one
    * band of `numHashes / bands` consecutive minhash values.
    *
    * The bands are EXPLODED into (band_idx, band_val) rows and self-joined
    * once on that composite key — one pass over the signatures and one
    * shuffle, rather than one join per band. Docs with no shingles (shorter
    * than the shingle width) produce no band rows and match nothing. */
  def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 4,
      bands: Int = 2,
      shingleN: Int = 3,
      family: HashFamily = Fnv64Family): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val banded = df.select(col(idCol),
        posexplode(bandsUdf(numHashes, bands, shingleN, family)(col(textCol)))
          .as(Seq("band_idx", "band_val")))
    val a = banded.toDF("a_id", "band_idx", "band_val")
    val b = banded.toDF("b_id", "band_idx", "band_val")
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  // ---------------------------------------------------------------- simhash

  /** 64-bit FNV-1a of a UTF-16 string — the shingle hash behind simhash.
    * Plain JVM code: only internal consistency matters (there is no DuckDB
    * twin to mirror), so the hash family is free to be fast. */
  private def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** 64-bit SimHash over word shingles: per-bit majority vote of shingle
    * hashes.
    *
    * Implemented as a scalar UDF rather than SQL lambda expressions:
    * the higher-order-function formulation evaluates 64 interpreted
    * aggregate passes per document (~32M lambda evals on the sf0.1 bench,
    * 16.7s); one JVM call per row with tight loops does the same work in
    * well under a second. The codegen-friendly preference (SURVEY §4) loses
    * to measurement here — higher-order fns are interpreted, not codegen'd.
    */
  def simhash(df: DataFrame, textCol: String, shingleN: Int = 1): DataFrame = {
    val f = udf { (text: String) =>
      if (text == null) 0L
      else {
        val toks = text.split(" ", -1)
        val votes = new Array[Int](64)
        val last = toks.length - shingleN
        var t = 0
        while (t <= last) {
          val s = if (shingleN == 1) toks(t)
                  else toks.slice(t, t + shingleN).mkString(" ")
          val h = fnv64(s)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
          t += 1
        }
        var sig = 0L
        var b = 0
        while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
        sig
      }
    }
    df.withColumn("simhash", f(col(textCol)))
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
    // |A| per doc is a map-side expression over the shingle array — no
    // shuffle (an earlier groupBy over the exploded rows added two extra
    // aggregate+broadcast stages and tripled the query's wall clock).
    val base = df.select(col(idCol).as("doc_id"),
      array_distinct(TextFns.shinglesUdf(shingleN)(col(textCol))).as("ss"))
    val sizes = base.select(col("doc_id"), size(col("ss")).cast("long").as("n"))
    val sh = base.select(col("doc_id"), explode(col("ss")).as("s"))
    val filtered = maxShingleDf match {
      case Some(m) =>
        import org.apache.spark.sql.expressions.Window
        sh.withColumn("__df", count(lit(1)).over(Window.partitionBy("s")))
          .filter(col("__df") <= m).drop("__df")
      case None => sh
    }
    val a = filtered.toDF("a_id", "s")
    val b = filtered.toDF("b_id", "s")
    // shuffle-hash hint: the exploded shingle sides are the same size, so
    // there is no small side to broadcast (AQE otherwise broadcasts one
    // whole exploded corpus) and no point sorting both (SMJ)
    val inter = a.join(b.hint("shuffle_hash"), "s").filter(col("a_id") < col("b_id"))
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
    * product; the scale path is [[Similarity.annLsh]] bucketing.
    *
    * Vectors are unit-normalized BEFORE the pair product, so each pair
    * costs one dot product instead of dot + two norms. */
  def cosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      blockCol: Option[String] = None): DataFrame = {
    val e = df.select(
      col(idCol).as("id"),
      VectorFns.unitizeUdf(col(vecCol)).as("v"),
      (blockCol.map(col).getOrElse(lit(0))).as("blk"))
    val a = e.toDF("a_id", "a_v", "blk")
    val b = e.toDF("b_id", "b_v", "blk")
    a.join(b, Seq("blk")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", VectorFns.dotNative(col("a_v"), col("b_v")))
      .filter(col("cos") >= minCosine)
      .select("a_id", "b_id", "cos")
  }
}
