package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Shared executed-plan assertions for specs and audit tools. The AQE
  * traversal (AdaptiveSparkPlanExec / QueryStageExec unwrapping) is subtle
  * enough that three hand-rolled copies had already grown — it lives once
  * here so a future Spark wrapper node gets handled everywhere at once.
  */
object PlanChecks {

  /** Every WindowExec with an EMPTY partition spec in the final adaptive
    * plan — the single-partition global-sort scale-cliff class (km1's
    * round-6 defect). Call AFTER an action so AQE has finalized.
    */
  def partitionlessWindows(p: SparkPlan): Seq[WindowExec] = {
    val self = p match {
      case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
      case _ => Nil
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self ++ kids.flatMap(partitionlessWindows)
  }

  /** Convenience: execute the frame, then walk its final plan. */
  def partitionlessWindows(df: DataFrame): Seq[WindowExec] = {
    df.collect()
    partitionlessWindows(df.queryExecution.executedPlan)
  }
}
