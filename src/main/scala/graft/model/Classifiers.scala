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
    // beyond the reference's five: the sklearn world's
    // GradientBoostingClassifier analogue, seeded like the rest (s17).
    // Not in Names — the s8 experiment matrix stays the reference's.
    case "gbt" => new GBTClassifier().setLabelCol(labelCol).setSeed(42L)
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

  /** Local mtime of a relation root for the split-staleness key.
    * Only `file:`/scheme-less paths have one; hdfs/s3 roots degrade to 0
    * (stable key, no re-land on version — the documented tradeoff)
    * instead of throwing — `new File(URI)` rejects any non-file absolute
    * URI with IllegalArgumentException (round-9 ADVICE item 4).
    */
  private[graft] def rootPathMtime(p: org.apache.hadoop.fs.Path): Long =
    graft.util.Landing.rootPathMtime(p)

  /** The seeded 70/30 split halves, LANDED once per (session,
    * prepared-plan, seed) — Landing.frameLanding keyed on the analyzed
    * plan's semanticHash, so s4, s5, and all five s8 cells (which fit on
    * the SAME dataset + seed) share one materialized split instead of
    * each re-splitting + re-checkpointing. History of this spot: plain
    * cache()+finally-unpersist raced under Experiments.matrix's
    * concurrent cells (identical cells share ONE CacheManager entry, the
    * first finisher's unpersist evicted it under the other fits); a
    * per-call localCheckpoint fixed the race but paid the split +
    * materialization per cell. The landing keeps the checkpoint's
    * own-storage-identity fix AND amortizes it: a concurrent
    * getOrElseUpdate race at worst builds twice and keeps one — both
    * builds are seeded-identical and nothing ever unpersists.
    *
    * Train is coalesced to 8 BEFORE checkpointing: the stroke parity
    * surface is driver-scale (~5k rows) and every LR/SVC fit iteration
    * otherwise launches one task per shuffle partition (~160 rows each).
    * Membership of the seeded split is decided before the coalesce, so
    * models stay within the golden AUC ranges. The two halves come from
    * two randomSplit calls with the same seed over the same cached frame
    * — per-partition seeded sampling makes them exact complements, same
    * as destructuring one call.
    */
  def split7030(prepared: DataFrame, seed: Long): (DataFrame, DataFrame) = {
    // plan hash = source identity, file-relation mtimes = source version
    // (Landing.planVersionKey) so an in-place CSV rewrite re-lands the
    // split instead of serving stale halves
    val key =
      s"stroke_split|${graft.util.Landing.planVersionKey(prepared)}|$seed"
    val train = graft.util.Landing.frameLanding(
      prepared.sparkSession, key + "|train")(
      prepared.randomSplit(Array(0.7, 0.3), seed)(0).coalesce(8))
    val test = graft.util.Landing.frameLanding(
      prepared.sparkSession, key + "|test")(
      prepared.randomSplit(Array(0.7, 0.3), seed)(1))
    (train, test)
  }

  /** 70/30 split path (stroke_predict.py:148-173): fit on train, score
    * test, AUC from rawPrediction. MEMOIZED per (classifier, prepared
    * source version, label, seed) — the split7030 accounting one level
    * up: two registered queries over the same seeded fit (s5's AUC and
    * s21's PR curve both read the LR scores) pay ONE fit per source
    * version, exactly as a production model registry serves one trained
    * artifact to every downstream evaluation. Seeded fits are
    * deterministic here (PARITY.md), so the memo is value-transparent;
    * family eviction drops superseded source versions
    * (Landing.memoVersioned).
    */
  private val fits =
    scala.collection.concurrent.TrieMap.empty[String, TrainResult]

  def trainEval(name: String, prepared: DataFrame,
      labelCol: String = "stroke", seed: Long = 42L): TrainResult = {
    // drop fits of stopped sessions (the frameLanding liveness guard)
    fits.filterInPlace((_, v) =>
      !v.predictions.sparkSession.sparkContext.isStopped)
    graft.util.Landing.memoVersioned(fits,
      s"fit:$name:$labelCol|" +
        s"${graft.util.Landing.planVersionKey(prepared)}|$seed") {
      val (train, test) = split7030(prepared, seed)
      val model = estimator(name, labelCol).fit(train)
      val pred = model.asInstanceOf[Model[_]].transform(test)
        .localCheckpoint(true)
      TrainResult(pred, evaluator(labelCol).evaluate(pred))
    }
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
