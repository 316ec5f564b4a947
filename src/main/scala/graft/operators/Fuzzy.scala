package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching: edit-distance pair generation with
  * recall-complete length blocking (SURVEY §7.6 — entity-resolution /
  * vocabulary-normalization support for corpus pipelines).
  */
object Fuzzy {

  /** All unordered pairs of distinct values of `strCol` within Levenshtein
    * distance `maxDist`.
    *
    * Scale shape: `levenshtein(a, b) >= |len(a) - len(b)|`, so one side is
    * keyed at its own length and the other side replicates to the 2·d+1
    * length buckets it could match — an equi-join on the bucket, never the
    * all-pairs product, and each unordered pair meets in EXACTLY one
    * bucket (the left value's length), so no distinct pass is needed.
    * The exact distance then filters candidates, keeping precision exact
    * while only recall-irrelevant pairs are pruned.
    *
    * Skew note: natural-language token lengths concentrate (most words are
    * 3–10 chars), so buckets are coarse. At corpus scale, compose with a
    * second blocking key that is stable under d edits — e.g. a q-gram
    * prefix band — or bound the vocabulary first (distinct() below keeps
    * the join on the VOCABULARY, which grows sub-linearly in corpus size,
    * not on the token stream). */
  def levenshteinPairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val vals = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()
    val a = vals.select(col("s").as("a"), length(col("s")).as("bkt"))
    val b = vals.select(col("s").as("b"),
      explode(sequence(length(col("s")) - maxDist, length(col("s")) + maxDist)).as("bkt"))
    a.join(b, "bkt")
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
      .select("a", "b", "dist")
  }
}
