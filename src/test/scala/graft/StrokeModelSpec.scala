package graft

import graft.model.Classifiers
import graft.pipeline.StrokePipeline
import graft.eval.ClassificationReport
import org.apache.spark.sql.functions._

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

  test("s28 calibration table: bins partition the scored test split, " +
      "fractions are consistent, and the model is monotone-calibrated " +
      "at the low-probability end") {
    import graft.pipeline.StrokePipeline
    import graft.model.Classifiers
    val prepared = StrokePipeline.prepare(spark, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("lr", prepared)
    import org.apache.spark.ml.functions.vector_to_array
    val scored = res.predictions.select(col("stroke").cast("long").as("y"),
      element_at(vector_to_array(col("probability")), 2).as("p1"))
    val rows = scored
      .withColumn("bin", least(floor(col("p1") * 10).cast("int"), lit(9)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"),
        avg(col("p1")).as("mp"))
      .collect().map(r => (r.getInt(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // bins partition the split exactly
    assert(rows.values.map(_._1).sum === scored.count())
    rows.foreach { case (b, (n, np, mp)) =>
      assert(np >= 0 && np <= n, s"bin $b fraction out of range")
      // mean prediction sits inside its own bin
      assert(mp >= b / 10.0 - 1e-12 && mp < (b + 1) / 10.0 + 1e-12,
        s"bin $b mean $mp outside [${b / 10.0}, ${(b + 1) / 10.0})")
    }
    // observed positive rate rises with predicted probability across the
    // populated low bins (n large enough to be stable)
    val fr = rows.toSeq.sortBy(_._1)
      .filter(_._2._1 >= 20)
      .map { case (b, (n, np, _)) => (b, np.toDouble / n) }
    assert(fr.size >= 3, "too few populated bins to test monotonicity")
    assert(fr.sliding(2).forall { case Seq((_, a), (_, b)) => b >= a },
      s"calibration not monotone over populated bins: $fr")
  }
}
