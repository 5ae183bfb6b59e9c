package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q

/** SparkEntry registrations for the stroke pipeline. These read the
  * reference CSV (read-only), so their DuckDB oracles read the SAME file
  * via read_csv — DuckDB recomputes counts/means/widths independently of
  * every Spark code path (StrokePipelineSpec goldens pin the rest).
  */
object StrokeQueries {

  private val csv = StrokePipeline.RawCsv

  /** A1: class distribution (stroke_predict.py:29-30).
    * Golden: 1→249, 0→4861.
    */
  private def s1ClassCounts(s: SparkSession, d: String): DataFrame =
    StrokePipeline.readCsv(s, StrokePipeline.RawCsv)
      .groupBy(col("stroke")).agg(count(lit(1)).as("n"))
      .orderBy(col("stroke"))

  private val s1Sql =
    s"""SELECT CAST(stroke AS INTEGER) AS stroke, CAST(count(*) AS BIGINT) AS n
       |FROM read_csv('$csv', header=true)
       |GROUP BY 1 ORDER BY stroke""".stripMargin

  /** A2/P3/P4: imputation statistic + post-clean profile.
    * Golden bmi mean: 28.893236911794673. Means rounded 6 dp: the oracle
    * averages the 4909 non-sentinel values directly while Spark averages
    * the 5110 mean-imputed values — mathematically equal, last-ulp
    * different.
    */
  private def s2CleanProfile(s: SparkSession, d: String): DataFrame = {
    val cleaned = StrokePipeline.clean(
      StrokePipeline.readCsv(s, StrokePipeline.RawCsv))
    cleaned.agg(
      count(lit(1)).as("n_rows"),
      round(avg(col("bmi")), 6).as("mean_bmi"),
      round(avg(col("age")), 6).as("mean_age"),
      sum(col("bmi").isNull.cast("long")).as("bmi_nulls"))
  }

  private val s2Sql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  round(avg(TRY_CAST(bmi AS DOUBLE)), 6) AS mean_bmi,
       |  round(avg(age), 6) AS mean_age,
       |  CAST(0 AS BIGINT) AS bmi_nulls
       |FROM read_csv('$csv', header=true)""".stripMargin

  /** ML1–ML5: encoded vector widths per categorical column + assembled
    * size. Golden: gender=3, ever_married=2, work_type=5,
    * Residence_type=2, smoking_status=4; features=21. The oracle derives
    * each width independently as count(DISTINCT col): StringIndexer(keep)
    * emits labels+1 indices and OneHotEncoder(dropLast) drops one —
    * net width = distinct count; `features` adds the 5 numeric slots.
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
      .orderBy(col("column"))
  }

  private val s3Sql =
    s"""WITH src AS (SELECT * FROM read_csv('$csv', header=true)),
       |w AS (
       |  SELECT 'gender' AS "column",
       |    CAST(count(DISTINCT gender) AS INT) AS width FROM src
       |  UNION ALL SELECT 'ever_married',
       |    CAST(count(DISTINCT ever_married) AS INT) FROM src
       |  UNION ALL SELECT 'work_type',
       |    CAST(count(DISTINCT work_type) AS INT) FROM src
       |  UNION ALL SELECT 'Residence_type',
       |    CAST(count(DISTINCT Residence_type) AS INT) FROM src
       |  UNION ALL SELECT 'smoking_status',
       |    CAST(count(DISTINCT smoking_status) AS INT) FROM src
       |  UNION ALL SELECT 'features',
       |    CAST(count(DISTINCT gender) + count(DISTINCT ever_married)
       |       + count(DISTINCT work_type) + count(DISTINCT Residence_type)
       |       + count(DISTINCT smoking_status) + 5 AS INT) FROM src)
       |SELECT "column", width FROM w ORDER BY "column"""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s1_stroke_class_counts" -> Q(s1ClassCounts, Some(s1Sql)),
    "s2_stroke_clean_profile" -> Q(s2CleanProfile, Some(s2Sql)),
    "s3_stroke_encoded_widths" -> Q(s3EncodedWidths, Some(s3Sql)),
  )
}
