package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Bounded top-k accumulation (SURVEY §7.5's one flagged custom-code
  * candidate).
  *
  * The window formulation (`row_number().over(partitionBy(q).orderBy(...))`)
  * SORTS every candidate of a query on one reducer before discarding all
  * but k. This Aggregator keeps only k elements per partition and merges
  * k-sized buffers map-side (partial aggregation), so the shuffle carries
  * `partitions x k` rows instead of every candidate — the difference
  * between feasible and not at a billion-row corpus.
  *
  * Ordering matches the verified window form exactly: (rounded cosine
  * desc, neighbor id asc) — same results, same oracle.
  */
class TopKAggregator(k: Int)
  extends Aggregator[(Long, Long, Double), Seq[(Double, Long, Double)], Seq[(Double, Long, Double)]] {
  // element = (orderKey = round(cos, 6), n_id, raw cos)

  /** Matches the window twin's ordering exactly, including NaN: Spark sorts
    * NaN as the LARGEST double (so desc puts NaN first), which is what
    * java.lang.Double.compare gives; Scala's sortBy(-x) would send NaN to
    * the back instead. */
  private val ord: Ordering[(Double, Long, Double)] =
    (x: (Double, Long, Double), y: (Double, Long, Double)) => {
      val c = java.lang.Double.compare(y._1, x._1) // desc, NaN greatest-first
      if (c != 0) c else java.lang.Long.compare(x._2, y._2)
    }

  /** HALF_UP to match Spark's round() exactly (rint would be HALF_EVEN);
    * round() passes NaN/inf through and so do we (BigDecimal would throw). */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def insert(
      buf: Seq[(Double, Long, Double)],
      e: (Double, Long, Double)): Seq[(Double, Long, Double)] = {
    // k is small (10-100): sorted-seq insertion is fine; swap for a heap if
    // k grows large
    val merged = (buf :+ e).sorted(ord)
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[(Double, Long, Double)] = Seq.empty

  override def reduce(
      b: Seq[(Double, Long, Double)], in: (Long, Long, Double)): Seq[(Double, Long, Double)] = {
    val e = (round6(in._3), in._2, in._3)
    // skip insertion when the buffer is full and e sorts after the tail
    if (b.size == k && ord.compare(b.last, e) <= 0) b else insert(b, e)
  }

  override def merge(
      a: Seq[(Double, Long, Double)], b: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Double, Long, Double)]): Seq[(Double, Long, Double)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long, Double)]] =
    ExpressionEncoder[Seq[(Double, Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Double)]] =
    ExpressionEncoder[Seq[(Double, Long, Double)]]()
}

object TopK {

  /** Exact cosine top-k via the bounded aggregator — same contract and
    * results as Similarity.bruteForceTopK (equality pinned in
    * SimilaritySpec), different physical shape: partial top-k map-side,
    * k-row merges, no full candidate sort. */
  def bruteForceTopKAgg(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(corpusId).as("n_id"),
      VectorFns.unitizeNative(col(corpusVec)).as("n_v"))
    val q = queries.select(col(queryId).as("q_id"),
      VectorFns.unitizeNative(col(queryVec)).as("q_v"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("q_id"), col("n_id"),
        VectorFns.dotNative(col("q_v"), col("n_v")).as("cos"))
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(k).toColumn
    scored.groupByKey(_._1).agg(agg)
      .flatMap { case (qId, tops) =>
        tops.zipWithIndex.map { case ((_, nId, raw), i) => (qId, nId, i + 1, raw) }
      }
      .toDF("q_id", "n_id", "rank", "cos")
  }

  /** Diversified top-k: the global k best rows, but no label (source,
    * language, cluster, domain) may contribute more than `perLabel` of
    * them — the anti-monoculture selection every curated eval set and
    * retrieval result page applies (plain top-k from a skewed corpus is
    * routinely one domain's top sliver repeated k times). Determinism:
    * ties break on `idCol` at both the per-label rank and the global cut,
    * so the selected SET is engine-portable when the score is
    * pre-rounded.
    *
    * Scale shape: the per-label rank is WindowGroupLimit-rewritten (map
    * tasks forward at most perLabel rows per label toward the ranking
    * shuffle — pinned in PlanSpec for the registered query), and the
    * global cut is orderBy+limit = TakeOrdered, k rows per partition,
    * never a global sort. NULL labels form their own capped group: an
    * unlabeled flood should not be able to monopolize the result either. */
  def diversifiedTopK(
      df: DataFrame, scoreCol: String, idCol: String, labelCol: String,
      k: Int, perLabel: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(perLabel >= 1, s"perLabel must be >= 1, got $perLabel")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(labelCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc_nulls_last)
    df.withColumn("__lr", row_number().over(w))
      .filter(col("__lr") <= perLabel).drop("__lr")
      .orderBy(col(scoreCol).desc, col(idCol).asc_nulls_last)
      .limit(k)
  }
}
