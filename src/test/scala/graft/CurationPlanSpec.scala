package graft

import java.io.File

import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-shape gate for the composed curation flagship: the one-element
  * explode after PII redaction is a deliberate generator barrier —
  * CollapseProject cannot merge through Generate, so the redacted text
  * is computed once per row as a real attribute. Without it the
  * optimizer inlines the redaction subtree into every consumer and the
  * fused projection falls out of whole-stage codegen (observed: ~50
  * copies, Janino failure, interpreted fallback). These assertions pin
  * the shape so a refactor can't silently reintroduce that.
  */
class CurationPlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("curationPipeline: redaction computed once behind a generator barrier, one shuffle") {
    assume(new File(sfDir).exists(), s"$sfDir not present")
    // AQE wraps the tree in a leaf AdaptiveSparkPlanExec, which hides
    // the inner nodes from collect(); disable it for the shape assertions
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assertShape()
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  private def assertShape(): Unit = {
    val df = Queries.curationPipeline(spark, sfDir)
    val plan = df.queryExecution.executedPlan

    val generates = plan.collect { case g: GenerateExec => g }
    assert(generates.size == 1, s"expected exactly one Generate barrier, got ${generates.size}")

    // the redaction expression lives ONLY in the Generate node: its
    // replacement literal must appear exactly once in the whole plan —
    // more means CollapseProject re-inlined it into downstream consumers
    val occurrences = "<EMAIL>".r.findAllIn(plan.toString).size
    assert(occurrences == 1,
      s"redaction subtree appears $occurrences times in the physical plan; barrier collapsed")

    // exactly one REQUIRED shuffle: the fingerprint hash-aggregate. The
    // sample filter must run on the reduced side, not add an exchange.
    // The round-18 scatter (repartition-if-under-partitioned, a no-op at
    // corpus scale) may add at most one ROUND-ROBIN repartition after
    // the scan — distinguish it by its partitioning so a real extra
    // hash exchange still fails.
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    val (scatter, required) = shuffles.partition(
      _.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.RoundRobinPartitioning])
    assert(required.size == 1,
      s"expected one hash Exchange (fingerprint agg), got ${required.size}")
    assert(scatter.size <= 1,
      s"expected at most the scatter round-robin repartition, got ${scatter.size}")

    assert(df.limit(1).count() == 1L, "pipeline must produce rows at sf0.001")
    ()
  }
}
