package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.pipeline.StrokePipeline
import graft.eval.ClassificationReport

/** SparkEntry registrations for the model/eval surface. These run real
  * spark.ml training on the reference CSV (small, seconds) — the full
  * 5-classifier × CV-grid sweep lives in StrokeModelSpec (golden AUC
  * ranges), not in Verify.
  */
object ModelQueries {

  /** ML10+ML14: RandomForest 70/30 on the unbalanced stroke data →
    * sklearn-style classification report (distributed confusion agg).
    */
  private def s4RfReport(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("rf", prepared)
    ClassificationReport.report(s, res.predictions, "stroke", "prediction")
  }

  /** ML6/ML12: LogisticRegression 70/30 AUC (golden ≈ 0.81 unbalanced). */
  private def s5LrAuc(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("lr", prepared)
    import s.implicits._
    Seq(("lr", "split70_30", res.auc)).toDF("classifier", "eval", "auc")
  }

  val qs: Seq[(String, Q)] = Seq(
    "s4_rf_report" -> Q(s4RfReport, None),
    "s5_lr_auc"    -> Q(s5LrAuc, None),
  )
}
