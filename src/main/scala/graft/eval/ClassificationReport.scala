package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classification metrics as distributed DataFrame aggregations.
  *
  * Reference: stroke_predict.py:159-169 collects the prediction column to
  * the driver and calls sklearn's classification_report /
  * confusion_matrix. Here everything derives from one tiny aggregate —
  * groupBy(label, prediction).count() — which is the only data that ever
  * reaches the driver (a handful of cells, not a column of predictions).
  *
  * sklearn parity details reproduced:
  *  - zero_division=1: undefined precision/recall (0/0) → 1.0
  *  - accuracy row, macro avg (unweighted mean) and weighted avg
  *    (support-weighted mean) rows
  */
object ClassificationReport {

  /** Confusion counts: one row per (label, prediction) cell. */
  def confusion(pred: DataFrame, labelCol: String = "label",
      predCol: String = "prediction"): DataFrame =
    pred.groupBy(col(labelCol).cast("double").as("label"),
        col(predCol).cast("double").as("prediction"))
      .agg(count(lit(1)).as("n"))

  final case class ClassMetrics(label: String, precision: Double,
      recall: Double, f1: Double, support: Long)

  /** sklearn-style report rows: one per class + accuracy + macro avg +
    * weighted avg. Computed on the driver from the confusion cells (tiny).
    */
  def report(spark: SparkSession, pred: DataFrame,
      labelCol: String = "label", predCol: String = "prediction",
      zeroDivision: Double = 1.0): DataFrame = {
    val cells = confusion(pred, labelCol, predCol).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    val classes = (cells.map(_._1) ++ cells.map(_._2)).distinct.sorted.toIndexedSeq
    val total = cells.map(_._3).sum
    val correct = cells.collect { case (l, p, n) if l == p => n }.sum

    def ratio(num: Long, den: Long): Double =
      if (den == 0) zeroDivision else num.toDouble / den

    val perClass = classes.map { c =>
      val tp = cells.collect { case (l, p, n) if l == c && p == c => n }.sum
      val fp = cells.collect { case (l, p, n) if l != c && p == c => n }.sum
      val fn = cells.collect { case (l, p, n) if l == c && p != c => n }.sum
      val precision = ratio(tp, tp + fp)
      val recall    = ratio(tp, tp + fn)
      val f1 =
        if (precision + recall == 0.0) 0.0
        else 2 * precision * recall / (precision + recall)
      ClassMetrics(formatLabel(c), precision, recall, f1, tp + fn)
    }

    val macroAvg = ClassMetrics("macro avg",
      mean(perClass.map(_.precision)), mean(perClass.map(_.recall)),
      mean(perClass.map(_.f1)), total)
    val weighted = ClassMetrics("weighted avg",
      wmean(perClass.map(m => (m.precision, m.support)), total),
      wmean(perClass.map(m => (m.recall, m.support)), total),
      wmean(perClass.map(m => (m.f1, m.support)), total), total)
    val accuracy = ClassMetrics("accuracy",
      correct.toDouble / total, correct.toDouble / total,
      correct.toDouble / total, total)

    import spark.implicits._
    (perClass :+ accuracy :+ macroAvg :+ weighted).toSeq.toDF()
  }

  /** Accuracy alone (reference prints it via sklearn's report). */
  def accuracy(pred: DataFrame, labelCol: String = "label",
      predCol: String = "prediction"): Double = {
    val row = pred.agg(
      count(lit(1)).as("n"),
      count(when(col(labelCol).cast("double") ===
        col(predCol).cast("double"), 1)).as("ok")).head()
    row.getLong(1).toDouble / row.getLong(0)
  }

  private def mean(xs: Seq[Double]): Double = xs.sum / xs.length
  private def wmean(xs: Seq[(Double, Long)], total: Long): Double =
    xs.map { case (v, w) => v * w }.sum / total
  private def formatLabel(c: Double): String =
    if (c == c.floor) c.toLong.toString else c.toString
}
