package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FoldIsNotNullConditional]]: `isnotnull(CASE ...)` with non-null
  * branch values folds to the branch-condition disjunction — the filter
  * that predicate pushdown would otherwise re-inline as a fat join
  * condition (the ISC flagship's +40% regression, SCALE.md round 14).
  */
class FoldIsNotNullConditionalSpec extends SparkSpec {
  import spark.implicits._

  // the year-dispatch shape the metadata compiler emits: branch values
  // coalesce to a default label (non-nullable), fall-through is NULL
  private def dispatch = when($"y" === 1, coalesce(when($"c" > 10, lit("big")), lit("other")))
    .when($"y" === 2, lit("two"))

  test("filter semantics unchanged, including NULL dispatch keys") {
    val df = Seq(
      (Some(1), 5L),   // y=1 -> "other" (coalesce default) -> kept
      (Some(1), 50L),  // y=1 -> "big" -> kept
      (Some(2), 5L),   // y=2 -> "two" -> kept
      (Some(3), 5L),   // no version for y=3 -> NULL -> dropped
      (None, 5L),      // NULL year: CaseWhen treats as false -> dropped
    ).toDF("y", "c")
    val out = df.withColumn("cls", dispatch).filter($"cls".isNotNull)
    assert(out.count() == 3)
    assert(out.where($"y".isNull || $"y" === 3).count() == 0)
  }

  test("projection semantics unchanged: IsNotNull never returns NULL") {
    val df = Seq((Some(1), 5L), (Some(3), 5L), (None, 5L)).toDF("y", "c")
    val got = df.select($"y", dispatch.isNotNull.as("nn"))
      .collect().map(r => (if (r.isNullAt(0)) -1 else r.getInt(0)) -> r.getBoolean(1)).toMap
    // the NULL-year row must yield FALSE, not NULL (the coalesce wrap)
    assert(got == Map(1 -> true, 3 -> false, -1 -> false))
  }

  test("the fold removes the conditional from the optimized filter predicate") {
    val df = Seq((1, 5L)).toDF("y", "c")
    val out = df.withColumn("cls", dispatch).filter($"cls".isNotNull).select("y")
    val optimized = out.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.expressions.{CaseWhen, If}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val conditionals = optimized.collect { case f: Filter =>
      f.condition.collect { case cw: CaseWhen => cw; case i: If => i }.size
    }.sum
    assert(conditionals == 0,
      s"dispatch chain survived in a filter predicate:\n$optimized")
  }

  test("nullable branch values are left alone (fold would be wrong)") {
    val df = Seq((Some(1), Some(5L)), (Some(1), None), (Some(2), Some(1L)))
      .toDF("y", "v")
    // branch value IS nullable (passes v through): isnotnull must still
    // test the VALUE, not just the branch condition
    val cls = when($"y" === 1, $"v").when($"y" === 2, lit(9L))
    assert(df.filter(cls.isNotNull).count() == 2)
  }
}
