package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** SparkEntry registrations for the stroke pipeline. These read the
  * reference CSVs (read-only), not the sfDir parquet, so they carry no
  * DuckDB oracle — correctness is pinned by StrokePipelineSpec goldens
  * (BASELINE.md "Deterministic ETL goldens").
  */
object StrokeQueries {

  /** A1: class distribution (stroke_predict.py:29-30).
    * Golden: 1→249, 0→4861.
    */
  private def s1ClassCounts(s: SparkSession, d: String): DataFrame =
    StrokePipeline.readCsv(s, StrokePipeline.RawCsv)
      .groupBy(col("stroke")).agg(count(lit(1)).as("n"))
      .orderBy(col("stroke"))

  /** A2/P3/P4: imputation statistic + post-clean profile.
    * Golden bmi mean: 28.893236911794673.
    */
  private def s2CleanProfile(s: SparkSession, d: String): DataFrame = {
    val cleaned = StrokePipeline.clean(
      StrokePipeline.readCsv(s, StrokePipeline.RawCsv))
    cleaned.agg(
      count(lit(1)).as("n_rows"),
      avg(col("bmi")).as("mean_bmi"),
      avg(col("age")).as("mean_age"),
      sum(col("bmi").isNull.cast("long")).as("bmi_nulls"))
  }

  /** ML1–ML5: encoded vector widths per categorical column + assembled
    * size. Golden: gender=3, ever_married=2, work_type=5,
    * Residence_type=2, smoking_status=4; features=21.
    */
  private def s3EncodedWidths(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.ml.linalg.Vector
    val prepared = StrokePipeline.prepare(s, StrokePipeline.RawCsv)
    val row = prepared.select("gender", "ever_married", "work_type",
      "Residence_type", "smoking_status", "features").head()
    val widths = (0 until 6).map(i => row.getAs[Vector](i).size)
    import s.implicits._
    Seq(("gender", widths(0)), ("ever_married", widths(1)),
      ("work_type", widths(2)), ("Residence_type", widths(3)),
      ("smoking_status", widths(4)), ("features", widths(5)))
      .toDF("column", "width")
  }

  val qs: Seq[(String, Q)] = Seq(
    "s1_stroke_class_counts" -> Q(s1ClassCounts, None),
    "s2_stroke_clean_profile" -> Q(s2CleanProfile, None),
    "s3_stroke_encoded_widths" -> Q(s3EncodedWidths, None),
  )
}
