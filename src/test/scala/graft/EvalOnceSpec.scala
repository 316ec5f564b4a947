package graft

import org.apache.spark.sql.functions._

/** Contracts of the [[graft.plans.EvalOnce]] optimizer fence: value
  * identity (it only narrows the optimizer's freedom), and the fence
  * actually preventing filter-alias substitution below the computing
  * projection — the duplicated-evaluation shape it exists to stop. */
class EvalOnceSpec extends SparkSpec {
  import sqlContext.implicits._

  test("EvalOnce is a value identity, nulls included, under codegen") {
    val df = Seq(Some("ab"), None).toDF("t")
      .withColumn("u", graft.plans.EvalOnce.once(upper($"t")))
    assert(df.collect().map(r => Option(r.getString(1))).toSet ==
      Set(Some("AB"), None))
  }

  test("EvalOnce fences filter substitution below the computing project") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // unfenced filter into the LocalRelation and leave no Filter node to
    // assert on
    val base = spark.range(1, 51).toDF("x").repartition(2)
    def q(fenced: Boolean) = {
      val c = concat(lit("v"), ($"x" % 7).cast("string"))
      base.withColumn("tag", if (fenced) graft.plans.EvalOnce.once(c) else c)
        .filter($"tag" === "v3")
    }
    def planStr(fenced: Boolean) =
      q(fenced).queryExecution.optimizedPlan.toString
    val fenced = planStr(fenced = true)
    val unfenced = planStr(fenced = false)
    // unfenced: the alias is substituted and the filter pushed below the
    // repartition (Repartition prints above Filter in the tree)
    assert(unfenced.indexOf("Repartition") < unfenced.indexOf("Filter"),
      s"expected the unfenced filter pushed below the repartition:\n$unfenced")
    // fenced: the filter stays a bare attribute comparison ABOVE the
    // projection and the repartition — one evaluation
    assert(fenced.contains("graft_eval_once"), fenced)
    assert(fenced.indexOf("Filter") < fenced.indexOf("Repartition"),
      s"expected the fenced filter to stay above the repartition:\n$fenced")
    // and the fence changes nothing about the result
    assert(q(fenced = true).collect().map(_.toString).sorted.toSeq ==
      q(fenced = false).collect().map(_.toString).sorted.toSeq)
  }

  test("EvalOnce survives constant folding on a foldable child (round 22)") {
    // UnaryExpression would inherit foldable = child.foldable, letting
    // ConstantFolding evaluate-and-delete the fence around a
    // literal-derived column; the fence must be unconditional
    val e = graft.plans.EvalOnce(
      org.apache.spark.sql.catalyst.expressions.Literal("const"))
    assert(!e.foldable, "EvalOnce must never be foldable")
    val df = spark.range(1, 3).toDF("x")
      .withColumn("c", graft.plans.EvalOnce.once(concat(lit("a"), lit("b"))))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_eval_once"),
      s"the fence was folded away over a foldable child:\n$plan")
    assert(df.collect().map(_.getString(1)).toSeq == Seq("ab", "ab"))
  }
}
