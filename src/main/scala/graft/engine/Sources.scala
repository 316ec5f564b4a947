package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Source connectors with schema validation (SURVEY §2.1 S2/S6, §3.2).
  *
  * The reference's ingest contract is (catalog-id -> local table) with the
  * schema fixed by a template, asserted at download time
  * (/root/reference/src/wins_transform_staging.py:118-135). Here: a parquet
  * scan validated against the declared StructType — fail fast at plan time
  * (the reference's `assert` behavior), never silently coerce.
  *
  * In production the same contract backs `spark.read.jdbc` (the SDE view
  * pull, :55-58) — swap the format, keep the validation.
  */
object Sources {

  final case class SchemaMismatch(table: String, problems: Seq[String])
    extends RuntimeException(
      s"schema mismatch for '$table':\n  ${problems.mkString("\n  ")}")

  /** Compare ignoring nullability and array-element nullability — parquet
    * writers vary on those; name+type is the contract. */
  private def diff(expected: StructType, actual: StructType): Seq[String] = {
    def norm(dt: org.apache.spark.sql.types.DataType): String = dt match {
      case a: ArrayType => s"array<${norm(a.elementType)}>"
      case other => other.simpleString
    }
    val exp = expected.fields.map(f => f.name.toLowerCase -> norm(f.dataType)).toMap
    val act = actual.fields.map(f => f.name.toLowerCase -> norm(f.dataType)).toMap
    val missing = (exp.keySet -- act.keySet).toSeq.sorted.map(c => s"missing column: $c")
    val extra = (act.keySet -- exp.keySet).toSeq.sorted.map(c => s"unexpected column: $c")
    val wrong = exp.keySet.intersect(act.keySet).toSeq.sorted.collect {
      case c if exp(c) != act(c) => s"column $c: expected ${exp(c)}, found ${act(c)}"
    }
    missing ++ extra ++ wrong
  }

  /** S2/S6 — validated scan: read `dir/name.parquet`, require the declared
    * schema (if one is registered). */
  def loadValidated(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = Tables.load(spark, dir, name)
    Schemas.fixtureSchemas.get(name).foreach { expected =>
      val problems = diff(expected, df.schema)
      if (problems.nonEmpty) throw SchemaMismatch(name, problems)
    }
    df
  }
}
