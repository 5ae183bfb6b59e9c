package graft

import graft.model.Classifiers
import graft.pipeline.StrokePipeline
import graft.eval.ClassificationReport

/** Model-quality goldens (BASELINE.md). Exact row membership of
  * randomSplit differs from the PySpark runs (partitioning-dependent), so
  * AUCs are asserted as ranges around the goldens (SURVEY.md §5.2-2), not
  * exact values. The full 5×CV sweep is too slow for CI; we cover each
  * classifier on the 70/30 path and one CV grid.
  */
class StrokeModelSpec extends SparkSpec {

  lazy val prepared = StrokePipeline.prepare(spark, StrokePipeline.RawCsv)
  lazy val preparedBal = StrokePipeline.prepare(spark, StrokePipeline.BalancedCsv)

  private def assertRange(name: String, v: Double, lo: Double, hi: Double) =
    assert(v >= lo && v <= hi, s"$name AUC $v outside [$lo, $hi]")

  test("LR 70/30 unbalanced AUC near golden 0.8109") {
    assertRange("lr", Classifiers.trainEval("lr", prepared).auc, 0.72, 0.90)
  }

  test("NB 70/30 unbalanced AUC inverted like the reference (~0.25)") {
    // NB rawPrediction ordering inverts the ROC — reproduce, don't fix.
    assertRange("nb", Classifiers.trainEval("nb", prepared).auc, 0.10, 0.40)
  }

  test("SVC 70/30 unbalanced AUC near golden 0.7274") {
    assertRange("svc", Classifiers.trainEval("svc", prepared).auc, 0.62, 0.85)
  }

  test("DT 70/30 unbalanced AUC near golden 0.7636") {
    assertRange("dt", Classifiers.trainEval("dt", prepared).auc, 0.60, 0.90)
  }

  test("RF 70/30 unbalanced AUC near golden 0.7980") {
    assertRange("rf", Classifiers.trainEval("rf", prepared).auc, 0.70, 0.90)
  }

  test("RF 70/30 balanced AUC near golden 0.9036") {
    assertRange("rf-bal", Classifiers.trainEval("rf", preparedBal).auc, 0.82, 0.97)
  }

  test("GBT 70/30 unbalanced AUC near its s17 golden 0.8323") {
    // beyond the reference's five — the s17 extension classifier
    assertRange("gbt", Classifiers.trainEval("gbt", prepared).auc, 0.70, 0.90)
  }

  test("LR 5-fold CV grid (resubstitution) near golden 0.8452 unbalanced") {
    // DT's grid-selected model is fold-split-sensitive (a shallow tree can
    // win CV and score near-constant on resubstitution), so the stable CV
    // golden to range-test is LR: 0.8452423146608133.
    assertRange("lr-cv", Classifiers.cvTrainEval("lr", prepared).auc, 0.78, 0.92)
  }

  test("classification report matches sklearn semantics on a toy case") {
    import spark.implicits._
    // labels:    1 1 1 0 0 0 0 0
    // predicted: 1 0 1 0 0 0 0 1
    val pred = Seq((1, 1), (1, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0), (0, 1))
      .toDF("label", "prediction")
    val rows = ClassificationReport.report(spark, pred, "label", "prediction")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val (p0, r0, f0, s0) = rows("0")
    assert(math.abs(p0 - 4.0 / 5) < 1e-12 && math.abs(r0 - 4.0 / 5) < 1e-12)
    assert(s0 === 5)
    val (p1, r1, _, s1) = rows("1")
    assert(math.abs(p1 - 2.0 / 3) < 1e-12 && math.abs(r1 - 2.0 / 3) < 1e-12)
    assert(s1 === 3)
    val (acc, _, _, _) = rows("accuracy")
    assert(math.abs(acc - 6.0 / 8) < 1e-12)
    val (mp, _, _, _) = rows("macro avg")
    assert(math.abs(mp - (4.0 / 5 + 2.0 / 3) / 2) < 1e-12)
    val (wp, _, _, _) = rows("weighted avg")
    assert(math.abs(wp - (4.0 / 5 * 5 + 2.0 / 3 * 3) / 8) < 1e-12)
  }

  test("report zero_division=1: absent predicted class gets precision 1.0") {
    import spark.implicits._
    val pred = Seq((1, 0), (0, 0), (0, 0)).toDF("label", "prediction")
    val rows = ClassificationReport.report(spark, pred, "label", "prediction")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("1") === 1.0)   // no predictions for class 1 → 0/0 → 1.0
  }

  test("accuracy helper agrees with report") {
    import spark.implicits._
    val pred = Seq((1, 1), (0, 1), (0, 0), (1, 0)).toDF("label", "prediction")
    assert(ClassificationReport.accuracy(pred, "label", "prediction") === 0.5)
  }
}
