package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CodegenMode, CostMode, ExtendedMode, FormattedMode, SimpleMode}

/** EXPLAIN orchestrator (SURVEY.md §2.1 A16; reference: `src/explain.rs:
  * 46-160` — EXPLAIN AST/SYNTAX/PLAN/PIPELINE/ESTIMATE with Text/Json
  * output, fetched on a side channel by `client.rs:1729-1852`).
  *
  * Spark-native: the Catalyst/Tungsten plan stack IS the pipeline, so the
  * reference's five operations map onto Spark's explain modes, plus
  * plan-inspection helpers the specs use to assert pushdown/codegen shape
  * (the structured equivalent of EXPLAIN PIPELINE).
  */
object Explain {

  sealed abstract class Mode(private[explain] val spark: org.apache.spark.sql.execution.ExplainMode)
  /** EXPLAIN SYNTAX analogue: analyzed + optimized logical plan. */
  case object Extended extends Mode(ExtendedMode)
  /** EXPLAIN PLAN analogue: final physical plan. */
  case object Simple extends Mode(SimpleMode)
  /** EXPLAIN PIPELINE analogue: per-node formatted physical detail. */
  case object Formatted extends Mode(FormattedMode)
  /** EXPLAIN ESTIMATE analogue: plan statistics. */
  case object Cost extends Mode(CostMode)
  /** Generated whole-stage code. */
  case object Codegen extends Mode(CodegenMode)

  def explain(df: DataFrame, mode: Mode = Formatted): String =
    df.queryExecution.explainString(mode.spark)

  /** All modes at once (reference `ExplainOptions` side-channel fetch). */
  def all(df: DataFrame): Map[String, String] =
    Seq(Extended, Simple, Formatted, Cost).map(m =>
      m.getClass.getSimpleName.stripSuffix("$") -> explain(df, m)).toMap

  // ------------------------------------------------- plan-shape helpers

  /** Scan-level pushdown evidence: PushedFilters/ReadSchema lines for
    * file sources, pushedWhere for the graft-ch connector. */
  def scanInfo(df: DataFrame): String = {
    val plan = df.queryExecution.executedPlan
    plan.collectLeaves().map(_.toString).mkString("\n")
  }

  /** Number of WholeStageCodegen spans — wide spans mean the plan stays
    * inside generated code (the perf property BENCH queries rely on). */
  def codegenSpans(df: DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.size
}
