package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * split assignment and sequence-packing indices. Both are pure map-side /
  * single-window column expressions — no UDFs, fully codegen'd.
  */
object Curation {

  /** Deterministic train/val/test (or any) split assignment by CONTENT
    * HASH of the id — not `rand()`: the assignment is reproducible across
    * runs, cluster sizes, row orders, and partitionings, and a given
    * document never migrates between splits when the corpus grows
    * (hash-stability is the property that keeps eval sets uncontaminated
    * across dataset versions).
    *
    * Mechanics: the first 4 hex chars of md5(id) are a uniform draw from
    * 65,536 buckets; split boundaries are cumulative percentages mapped to
    * hex thresholds and compared as strings (md5 hex is lowercase in both
    * Spark and DuckDB, so the oracle mirrors exactly).
    *
    * `cuts` are (name, percent) with percents summing to 100.
    */
  def assignSplits(
      df: DataFrame, idCol: String,
      cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(cuts.nonEmpty && cuts.map(_._2).sum == 100,
      s"split percents must sum to 100: $cuts")
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val thresholds = cuts.scanLeft(0)(_ + _._2).tail.dropRight(1)
      .map(p => f"${p * 65536 / 100}%04x")
    // fold from the last cut backwards: h < t1 -> cut1, < t2 -> cut2, ...
    val expr = cuts.init.map(_._1).zip(thresholds).foldRight(lit(cuts.last._1): Column) {
      case ((name, t), rest) => when(h < lit(t), lit(name)).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Sequence-packing index (GPT-style concat-and-split pretraining prep):
    * within each partition (e.g. language or shard), documents ordered by
    * id are concatenated conceptually and cut every `tokenBudget` tokens;
    * `pack_id` is the bin of each document's STARTING token offset —
    * `floor((cumsum(tokens) - tokens) / budget)`. One window shuffle on
    * the partition columns; deterministic (ordered by id).
    *
    * This is the index-building step: the actual byte concat happens at
    * write time per (partition, pack_id) group.
    */
  def packIndex(
      df: DataFrame, idCol: String, tokCol: String,
      tokenBudget: Long, partitionCols: Seq[String]): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("pack_id",
      floor((sum(col(tokCol)).over(w) - col(tokCol)) / tokenBudget))
  }
}
