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
    *
    * Driver gate: the whole report, metrics rounded 4 dp, against frozen
    * golden literals in the oracle — the seeded split + seeded RF on the
    * fixed stroke CSV is deterministic in this environment (PARITY.md),
    * so the pin is hard; an intentional semantic change regenerates the
    * literals from a verified run.
    */
  private def s4RfReport(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("rf", prepared)
    ClassificationReport.report(s, res.predictions, "stroke", "prediction")
      .select(col("label"), round(col("precision"), 4).as("precision"),
        round(col("recall"), 4).as("recall"), round(col("f1"), 4).as("f1"),
        col("support"))
      .orderBy(col("label"))
  }

  private val s4Sql =
    """SELECT * FROM (VALUES
      |  ('0',            CAST(0.9524 AS DOUBLE), CAST(1.0 AS DOUBLE),
      |                   CAST(0.9756 AS DOUBLE), CAST(1400 AS BIGINT)),
      |  ('1',            1.0,    0.0,    0.0,    70),
      |  ('accuracy',     0.9524, 0.9524, 0.9524, 1470),
      |  ('macro avg',    0.9762, 0.5,    0.4878, 1470),
      |  ('weighted avg', 0.9546, 0.9524, 0.9292, 1470))
      |AS t(label, "precision", recall, f1, support)
      |ORDER BY label""".stripMargin

  /** ML6/ML12: LogisticRegression 70/30 AUC (golden ≈ 0.82 unbalanced).
    * Gate: AUC rounded 4 dp vs the frozen golden + a wide in-band flag
    * stating the semantic contract independently of the exact pin.
    */
  private def s5LrAuc(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("lr", prepared)
    import s.implicits._
    Seq(("lr", "split70_30", res.auc)).toDF("classifier", "eval", "auc")
      .select(col("classifier"), col("eval"),
        round(col("auc"), 4).as("auc_r4"),
        (col("auc") >= 0.78 && col("auc") <= 0.86).as("auc_in_band"))
  }

  private val s5Sql =
    """SELECT 'lr' AS classifier, 'split70_30' AS "eval",
      |  CAST(0.8217 AS DOUBLE) AS auc_r4, TRUE AS auc_in_band""".stripMargin

  /** S17: GradientBoosted trees 70/30 AUC — the sklearn family member
    * the reference's five (LR/NB/SVC/DT/RF) leave out, completing the
    * classifier matrix a user migrating from the sklearn world expects.
    * Same seeded-golden discipline as s5: the seeded split + seeded GBT
    * (20 boosting rounds, depth-5 trees — spark.ml defaults) on the
    * fixed stroke CSV is deterministic in this environment (PARITY.md);
    * AUC pinned rounded 4 dp + a wide in-band flag carrying the
    * semantic contract independently of the pin.
    *
    * Scale: boosting is inherently sequential in rounds, but each round
    * is one distributed tree fit (histogram-based splits, map-side
    * binning) — the per-round cost is a scan + fixed-depth split search,
    * no driver materialization beyond split stats.
    */
  private def s17GbtAuc(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("gbt", prepared)
    import s.implicits._
    Seq(("gbt", "split70_30", res.auc)).toDF("classifier", "eval", "auc")
      .select(col("classifier"), col("eval"),
        round(col("auc"), 4).as("auc_r4"),
        (col("auc") >= 0.70 && col("auc") <= 0.90).as("auc_in_band"))
  }

  private val s17Sql =
    """SELECT 'gbt' AS classifier, 'split70_30' AS "eval",
      |  CAST(0.8323 AS DOUBLE) AS auc_r4, TRUE AS auc_in_band""".stripMargin

  /** S21: the PRECISION/RECALL CURVE behind s5's single AUC number — the
    * threshold-sweep table an operator actually reads when picking a
    * deployment cutoff (sklearn's precision_recall_curve, at the nine
    * decile thresholds). Exact integer confusion counts per threshold
    * ride as the payload (tp / predicted-positives / positives), with
    * precision/recall rounded 4 dp; the no-predicted-positive edge takes
    * precision 1.0 — s4's zero_division=1 convention. Seeded split +
    * seeded LR make the whole table deterministic (the s4/s5/s8 golden
    * discipline; literals regenerate from a verified dump after any
    * intentional semantic change). Scale: one scan of the scored test
    * split crossed with 9 threshold rows — counts combine map-side.
    */
  private def s21PrCurve(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("lr", prepared)
    import org.apache.spark.ml.functions.vector_to_array
    import s.implicits._
    val scored = res.predictions.select(col("stroke").cast("long").as("y"),
      element_at(vector_to_array(col("probability")), 2).as("p1"))
    val thresholds = (1 to 9).map(_ / 10.0).toDF("thr")
    scored.crossJoin(broadcast(thresholds))
      .groupBy(col("thr"))
      .agg(
        sum(when(col("p1") >= col("thr") && col("y") === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("p1") >= col("thr"), 1L).otherwise(0L))
          .as("n_pred_pos"),
        sum(col("y")).as("n_pos"))
      .select(col("thr"), col("tp"), col("n_pred_pos"), col("n_pos"),
        round(when(col("n_pred_pos") === 0, 1.0)
          .otherwise(col("tp").cast("double") / col("n_pred_pos")), 4)
          .as("precision_r4"),
        round(col("tp").cast("double") / col("n_pos"), 4).as("recall_r4"))
      .orderBy(col("thr"))
  }

  // golden literals from the verified 2026-08-16 dump (seeded split +
  // seeded LR; regenerate after intentional semantic changes)
  private val s21Sql =
    """SELECT * FROM (VALUES
      |  (CAST(0.1 AS DOUBLE), CAST(46 AS BIGINT), CAST(267 AS BIGINT),
      |     CAST(70 AS BIGINT), CAST(0.1723 AS DOUBLE),
      |     CAST(0.6571 AS DOUBLE)),
      |  (0.2, 23, 101, 70, 0.2277, 0.3286),
      |  (0.3,  7,  29, 70, 0.2414, 0.1),
      |  (0.4,  0,   2, 70, 0.0,    0.0),
      |  (0.5,  0,   0, 70, 1.0,    0.0),
      |  (0.6,  0,   0, 70, 1.0,    0.0),
      |  (0.7,  0,   0, 70, 1.0,    0.0),
      |  (0.8,  0,   0, 70, 1.0,    0.0),
      |  (0.9,  0,   0, 70, 1.0,    0.0))
      |AS t(thr, tp, n_pred_pos, n_pos, precision_r4, recall_r4)
      |ORDER BY thr""".stripMargin

  /** S28: the CALIBRATION (reliability) table behind s5's AUC — does a
    * predicted probability MEAN what it says? Scores bin into ten
    * fixed-width probability buckets; each row carries the exact
    * integer payload (n, positives) plus mean-predicted and
    * observed-positive-fraction rounded 4 dp — sklearn's
    * `calibration_curve(strategy='uniform')` as a table. AUC ranks;
    * calibration is what a threshold-picking operator needs NEXT to
    * the s21 curve (an over-confident model with good AUC still burns
    * whoever reads its probabilities as probabilities). Same
    * seeded-golden discipline as s4/s5/s21; empty bins are absent, not
    * zero-filled. Scale: one scan of the scored split, ten groups,
    * map-side partials.
    */
  private def s28Calibration(s: SparkSession, d: String): DataFrame = {
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val res = Classifiers.trainEval("lr", prepared)
    import org.apache.spark.ml.functions.vector_to_array
    // round-15 advice: 3-dp rounding + a minimum bin size widen the
    // regen-stability margin — tiny tail bins (n=2 at bin 4) amplified
    // 4th-decimal probability drift into golden-hash breaks with no
    // semantic regression; sklearn users drop such bins anyway
    res.predictions.select(col("stroke").cast("long").as("y"),
        element_at(vector_to_array(col("probability")), 2).as("p1"))
      .withColumn("bin", least(floor(col("p1") * 10).cast("int"), lit(9)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
        round(avg(col("p1")), 3).as("mean_pred_r3"))
      .filter(col("n") >= 5)
      .select(col("bin"), col("n"), col("n_pos"), col("mean_pred_r3"),
        round(col("n_pos").cast("double") / col("n"), 3).as("frac_pos_r3"))
      .orderBy(col("bin"))
  }

  // golden literals from the verified round-16 dump (seeded split +
  // seeded LR; regenerate after intentional semantic changes). 3-dp
  // rounding + the n>=5 bin floor per the round-15 advice.
  private val s28Sql =
    """SELECT * FROM (VALUES
      |  (CAST(0 AS INTEGER), CAST(1203 AS BIGINT), CAST(24 AS BIGINT),
      |     CAST(0.022 AS DOUBLE), CAST(0.02 AS DOUBLE)),
      |  (1, 166, 23, 0.141, 0.139),
      |  (2,  72, 16, 0.239, 0.222),
      |  (3,  27,  7, 0.342, 0.259))
      |AS t(bin, n, n_pos, mean_pred_r3, frac_pos_r3)
      |ORDER BY bin""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s4_rf_report" -> Q(s4RfReport, Some(s4Sql)),
    "s5_lr_auc"    -> Q(s5LrAuc, Some(s5Sql)),
    "s17_gbt_auc"  -> Q(s17GbtAuc, Some(s17Sql)),
    "s21_pr_curve" -> Q(s21PrCurve, Some(s21Sql)),
    "s28_calibration" -> Q(s28Calibration, Some(s28Sql)),
  )
}
