package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion (SURVEY.md §2.1 S1).
  *
  * Two modes:
  *  - parity mode: header + schema inference, exactly as the reference
  *    (stroke_predict.py:22-23) — costs a full extra pass over the file;
  *  - production mode: explicit schema, single pass — the only acceptable
  *    shape at 100 TB (schema inference over a petabyte of CSV is a full
  *    extra scan of the lake).
  */
object CsvSource {

  /** Parity with the reference: infer types, treat first row as header. */
  def inferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Single-pass read with a declared schema. */
  def withSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** The stroke CSV's inferred schema, declared (for the fast path).
    * `bmi` stays string — the "N/A" sentinel is data, not schema
    * (FIXTURES.md §A1).
    */
  val StrokeSchema: StructType = StructType.fromDDL(
    "id INT, gender STRING, age DOUBLE, hypertension INT, heart_disease INT, " +
      "ever_married STRING, work_type STRING, Residence_type STRING, " +
      "avg_glucose_level DOUBLE, bmi STRING, smoking_status STRING, stroke INT")
}
