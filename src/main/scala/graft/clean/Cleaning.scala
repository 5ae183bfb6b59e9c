package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Cleaning operators (SURVEY.md §2.2 P3/P4 + §2.7d).
  *
  * The reference's load-bearing quirk: the imputation statistic for `bmi`
  * is the mean of the *string* column under numeric coercion — i.e. the
  * sentinel rows fall out as nulls and the mean covers only parseable
  * values (stroke_predict.py:46-53). Spark 4's ANSI mode would throw on
  * the coercion, so try_cast reproduces the PySpark-3.x semantics exactly.
  */
object Cleaning {

  /** Mean of a string-typed numeric column, ignoring unparseable rows. */
  def coercedMean(df: DataFrame, c: String): Double =
    df.agg(avg(col(c).try_cast(DoubleType))).head().getDouble(0)

  /** Replace a sentinel token with a fixed value, then cast. */
  def imputeSentinel(df: DataFrame, c: String, sentinel: String,
      value: Double, to: DataType = DoubleType): DataFrame =
    df.withColumn(c,
      when(col(c) === sentinel, lit(value)).otherwise(col(c)).try_cast(to))

  /** Sentinel-aware mean imputation in one step (the reference's A2+P3+P4
    * composition).
    */
  def imputeSentinelWithMean(df: DataFrame, c: String,
      sentinel: String): DataFrame =
    imputeSentinel(df, c, sentinel, coercedMean(df, c))

  /** Defensive casts (stroke_prediction_balanced.ipynb:71-72). */
  def castColumns(df: DataFrame, casts: (String, DataType)*): DataFrame =
    casts.foldLeft(df) { case (acc, (c, t)) =>
      acc.withColumn(c, col(c).cast(t))
    }
}
