package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching: edit-distance pair generation with
  * recall-complete segment blocking (SURVEY §7.6 — entity-resolution /
  * vocabulary-normalization support for corpus pipelines).
  */
object Fuzzy {

  /** All unordered pairs of distinct values of `strCol` within Levenshtein
    * distance `maxDist`.
    *
    * Scale shape — pigeonhole segment blocking (the partition signature of
    * PassJoin, Li et al., ICDE'11; same guarantee structure as the simhash
    * multi-table scheme in Dedup.scala): each string `a` is split into
    * `maxDist + 1` contiguous segments at positions derived from its own
    * length. At most `maxDist` edit operations can touch at most `maxDist`
    * segments, so for any `b` with `lev(a, b) <= maxDist` at least one
    * segment of `a` survives unedited and appears VERBATIM in `b`, its
    * start shifted by at most `maxDist` (one position per indel). The probe
    * side therefore extracts, for every candidate partner length `L` in
    * `[len(b)-d, len(b)+d]` and every segment index, the substrings of `b`
    * at the <= 2d+1 allowed start offsets, and the join key is
    * `(L, segmentIdx, segmentText)` — content-based and fine-grained, so
    * the hot length buckets of natural-language vocabularies (most tokens
    * are 3-10 chars) fan out across segment text instead of colliding.
    * Fan-out is a small constant: `maxDist+1` index rows and at most
    * `(2d+1)^2 (d+1)` probe rows per value (75 at d=2) — never an
    * all-pairs product. Candidates are deduplicated (a pair can meet in
    * several segments), then the exact distance — computed with the
    * early-exit threshold form — keeps precision exact.
    *
    * Strings shorter than `maxDist + 1` have empty trailing segments; an
    * empty segment key degrades to length blocking, which is safe because
    * only strings of length <= maxDist produce one and partners must have
    * length <= 2·maxDist. Residual skew (a segment value that is extremely
    * common at one (L, idx), e.g. a shared prefix in an id scheme) is
    * bounded by vocabulary shape, not corpus size, and AQE skew-join
    * handles stragglers.
    *
    * The join is on the VOCABULARY (`distinct()` below), which grows
    * sub-linearly in corpus size, not on the token stream. */
  def levenshteinPairs(df: DataFrame, strCol: String, maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    val k = maxDist + 1
    val vals = df.select(col(strCol).cast("string").as("s"))
      .filter(col("s").isNotNull).distinct()

    // Even partition of a length-L string into k segments: the first
    // (L mod k) segments get one extra char. Start/length are functions of
    // (L, idx) alone, so both sides derive them identically.
    def segLen(l: Column, idx: Column): Column =
      (l / k).cast("int") + when(idx < l % k, 1).otherwise(0)
    def segStart(l: Column, idx: Column): Column =
      idx * (l / k).cast("int") + least(idx, l % k)

    val idx = vals
      .select(col("s").as("a"), length(col("s")).as("L"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("a"), col("L"), col("i"),
        col("a").substr(segStart(col("L"), col("i")) + 1, segLen(col("L"), col("i"))).as("seg"))

    // Probe: for each candidate indexed-length L and segment index, the
    // substrings of b at every start within +-maxDist of the segment's
    // position in the (hypothetical) indexed string.
    val tLo = greatest(segStart(col("L"), col("i")) - maxDist, lit(0))
    val tHi = least(col("lb") - segLen(col("L"), col("i")), segStart(col("L"), col("i")) + maxDist)
    val prb = vals
      .select(col("s").as("b"), length(col("s")).as("lb"))
      .select(col("b"), col("lb"),
        explode(sequence(greatest(col("lb") - maxDist, lit(0)), col("lb") + maxDist)).as("L"))
      .select(col("b"), col("lb"), col("L"),
        explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("b"), col("L"), col("i"),
        // an empty window means b cannot contain this segment at any
        // admissible offset (sequence() would flip to a descending range)
        explode(when(tHi >= tLo, sequence(tLo, tHi)).otherwise(array().cast("array<int>"))).as("t"),
        segLen(col("L"), col("i")).as("sl"))
      .select(col("b"), col("L"), col("i"), col("b").substr(col("t") + 1, col("sl")).as("seg"))

    idx.join(prb, Seq("L", "i", "seg"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
      .withColumn("dist", levenshtein(col("a"), col("b"), maxDist))
      .filter(col("dist") >= 0) // threshold form returns -1 above maxDist
      .select("a", "b", "dist")
  }
}
