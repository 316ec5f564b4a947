package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup family semantics on literal corpora with planted duplicates. */
class DedupSpec extends SparkSpec {
  import sqlContext.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different words appear in this one here"),
    (5L, "short text")                                      // < 3 tokens of shingle? 2 tokens
  ).toDF("doc_id", "text")

  test("exactGroups: identical content collapses to one group keeping min id") {
    val g = Dedup.exactGroups(corpus, "doc_id", "text").collect()
    assert(g.length == 4) // 1+2 merge
    val dup = g.find(_.getLong(2) == 2L).get
    assert(dup.getLong(1) == 1L) // keep_id = min
  }

  test("minhash: exact dups always candidates; both hash families agree on them; short docs never match") {
    for (fam <- Seq(Dedup.Md5Family, Dedup.Fnv64Family)) {
      val pairs = Dedup.minhashCandidates(corpus, "doc_id", "text",
        numHashes = 4, bands = 2, shingleN = 3, family = fam)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L))) // identical signatures -> same bands
      assert(!pairs.exists { case (a, b) => a == 5L || b == 5L }) // no shingles -> no band
      assert(!pairs.contains((1L, 4L)) && !pairs.contains((2L, 4L))) // unrelated text
    }
  }

  test("simhash: identical text -> identical hash; near-dup hamming < unrelated hamming") {
    val h = Dedup.simhash(corpus, "text").select("doc_id", "simhash")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)))
  }

  test("simhashCandidates: exact dups at hamming 0; unrelated pairs filtered by maxHamming") {
    val c = Dedup.simhashCandidates(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(c((1L, 2L)) == 0)
    assert(!c.contains((1L, 4L)))
  }

  test("ngramJaccardPairs: exact value for known overlap; skew guard keeps high-jaccard pairs") {
    // docs 1,2 identical -> jaccard 1.0; doc 3 differs in token idx 7 of 9,
    // which appears in 2 of the 7 3-gram shingles -> 5 shared / 9 union
    val p = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", shingleN = 3, minJaccard = 0.1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(p((1L, 2L)) == 1.0)
    assert(math.abs(p((1L, 3L)) - 5.0 / 9.0) < 1e-12)
    val guarded = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      shingleN = 3, minJaccard = 0.9, maxShingleDf = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == Set((1L, 2L)))
  }

  test("cosinePairs: identical vectors at cosine 1; orthogonal pairs excluded; blocking bounds the product") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "x"),
      (2L, Array(1.0f, 0.0f, 0.0f), "x"),
      (3L, Array(0.0f, 1.0f, 0.0f), "x"),
      (4L, Array(1.0f, 0.0f, 0.0f), "y")) // identical to 1 but other block
      .toDF("vec_id", "embedding", "blk")
    val all = Dedup.cosinePairs(vecs, "vec_id", "embedding", minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    val blocked = Dedup.cosinePairs(vecs, "vec_id", "embedding", 0.9, blockCol = Some("blk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == Set((1L, 2L))) // cross-block pair pruned by design
  }
}
