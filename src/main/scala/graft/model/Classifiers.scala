package graft.model

import org.apache.spark.ml.classification._
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.sql.DataFrame

/** The reference's five binary classifiers + CV grid search
  * (stroke_predict.py:136-218, both notebooks cells 9-12).
  *
  * Grids transcribed exactly from stroke_predict.py:177-214:
  *   LR / LinearSVC: regParam {0.01, 0.1, 1}, maxIter {10, 20, 30}
  *   NaiveBayes:     smoothing {0.1, 0.5, 1}
  *   DecisionTree:   maxDepth {2, 5, 10}, maxBins {10, 20, 30}
  *   RandomForest:   numTrees {50, 100, 150}, maxDepth {2, 5, 10}
  * CV: 5 folds, BinaryClassificationEvaluator (areaUnderROC), and the
  * reference's *resubstitution* evaluation — bestModel scored on the full
  * training frame (stroke_predict.py:216-218). That choice is what the
  * golden AUCs measure, so it is reproduced, not "fixed".
  */
object Classifiers {

  val Names: Seq[String] = Seq("lr", "nb", "svc", "dt", "rf")

  def estimator(name: String, labelCol: String = "stroke")
      : Estimator[_ <: Model[_]] = name match {
    case "lr"  => new LogisticRegression().setLabelCol(labelCol)
    case "nb"  => new NaiveBayes().setLabelCol(labelCol)
    case "svc" => new LinearSVC().setLabelCol(labelCol)
    case "dt"  => new DecisionTreeClassifier().setLabelCol(labelCol)
    case "rf"  => new RandomForestClassifier().setLabelCol(labelCol)
  }

  def grid(name: String, labelCol: String = "stroke"): Array[ParamMap] =
    name match {
      case "lr" =>
        val e = new LogisticRegression().setLabelCol(labelCol)
        new ParamGridBuilder()
          .addGrid(e.regParam, Array(0.01, 0.1, 1.0))
          .addGrid(e.maxIter, Array(10, 20, 30)).build()
      case "nb" =>
        val e = new NaiveBayes().setLabelCol(labelCol)
        new ParamGridBuilder()
          .addGrid(e.smoothing, Array(0.1, 0.5, 1.0)).build()
      case "svc" =>
        val e = new LinearSVC().setLabelCol(labelCol)
        new ParamGridBuilder()
          .addGrid(e.regParam, Array(0.01, 0.1, 1.0))
          .addGrid(e.maxIter, Array(10, 20, 30)).build()
      case "dt" =>
        val e = new DecisionTreeClassifier().setLabelCol(labelCol)
        new ParamGridBuilder()
          .addGrid(e.maxDepth, Array(2, 5, 10))
          .addGrid(e.maxBins, Array(10, 20, 30)).build()
      case "rf" =>
        val e = new RandomForestClassifier().setLabelCol(labelCol)
        new ParamGridBuilder()
          .addGrid(e.numTrees, Array(50, 100, 150))
          .addGrid(e.maxDepth, Array(2, 5, 10)).build()
    }

  def evaluator(labelCol: String = "stroke"): BinaryClassificationEvaluator =
    new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setMetricName("areaUnderROC")

  final case class TrainResult(predictions: DataFrame, auc: Double)

  /** 70/30 split path (stroke_predict.py:148-173): fit on train, score
    * test, AUC from rawPrediction.
    */
  def trainEval(name: String, prepared: DataFrame,
      labelCol: String = "stroke", seed: Long = 42L): TrainResult = {
    val Array(train, test) = prepared.randomSplit(Array(0.7, 0.3), seed)
    // LR/LinearSVC run up to 100 treeAggregate passes over `train`;
    // materialize it once per call via an eager localCheckpoint. Plain
    // cache()+finally-unpersist raced under Experiments.matrix's
    // concurrent cells: identical (dataset, seed) cells share ONE
    // CacheManager entry (dedup by canonicalized plan), so the first
    // finisher's unpersist evicted it under the other fits — results
    // stayed correct (seeded recompute) but the caching silently
    // vanished. The checkpoint has its own storage identity per call and
    // its blocks are freed by the ContextCleaner once the frame is GC'd.
    //
    // Coalesce first: the stroke parity surface is inherently
    // driver-scale data (~5k rows), and every fit iteration otherwise
    // launches one task per shuffle partition (~160 rows each) — task
    // overhead, not compute. Membership of the seeded split is decided
    // BEFORE the coalesce, so models stay within the golden AUC ranges.
    val model = estimator(name, labelCol)
      .fit(train.coalesce(8).localCheckpoint())
    val pred = model.asInstanceOf[Model[_]].transform(test)
    TrainResult(pred, evaluator(labelCol).evaluate(pred))
  }

  /** 5-fold CV grid path with resubstitution evaluation
    * (stroke_predict.py:177-218).
    */
  def cvTrainEval(name: String, prepared: DataFrame,
      labelCol: String = "stroke", seed: Long = 42L,
      parallelism: Int = 4): TrainResult = {
    val cv = new CrossValidator()
      .setEstimator(estimator(name, labelCol))
      .setEstimatorParamMaps(grid(name, labelCol))
      .setEvaluator(evaluator(labelCol))
      .setNumFolds(5)
      .setParallelism(parallelism)
      .setSeed(seed)
    val model = cv.fit(prepared)
    // Resubstitution: score the FULL frame, as the reference does.
    val pred = model.bestModel.transform(prepared)
    TrainResult(pred, evaluator(labelCol).evaluate(pred))
  }
}
