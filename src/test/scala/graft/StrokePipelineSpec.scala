package graft

import org.apache.spark.sql.functions._
import graft.pipeline.StrokePipeline
import org.apache.spark.ml.linalg.Vector

/** Golden end-to-end assertions from BASELINE.md "Deterministic ETL
  * goldens" + FIXTURES.md §A4 — the reference's executed notebook outputs
  * are the contract.
  */
class StrokePipelineSpec extends SparkSpec {

  lazy val raw = StrokePipeline.readCsv(spark, StrokePipeline.RawCsv).cache()
  lazy val balanced = StrokePipeline.readCsv(spark, StrokePipeline.BalancedCsv).cache()

  test("S1: inferred schema matches the golden printSchema") {
    val types = raw.dtypes.toMap
    assert(raw.count() === 5110)
    assert(types("id") === "IntegerType")       // int in raw CSV
    assert(types("bmi") === "StringType")       // "N/A" forces string
    assert(types("age") === "DoubleType")
    assert(types("stroke") === "IntegerType")
    assert(raw.columns.contains("Residence_type")) // capital R verbatim
    // balanced CSV: fractional synthetic ids infer as double
    assert(balanced.dtypes.toMap.apply("id") === "DoubleType")
    assert(balanced.count() === 9647)
  }

  test("A1: stroke class counts match goldens") {
    val counts = raw.groupBy("stroke").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts === Map(1 -> 249L, 0 -> 4861L))
    val bCounts = balanced.groupBy("stroke").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bCounts === Map(1 -> 4786L, 0 -> 4861L))
  }

  test("A2: imputation means match goldens to 1e-9") {
    assert(math.abs(StrokePipeline.bmiMean(raw) - 28.893236911794673) < 1e-9)
    assert(math.abs(StrokePipeline.bmiMean(balanced) - 29.656603525388007) < 1e-9)
  }

  test("describe goldens: mean(age), mean(stroke)") {
    val r = raw.agg(avg("age"), avg("stroke")).head()
    assert(math.abs(r.getDouble(0) - 43.226614481409015) < 1e-9)
    assert(math.abs(r.getDouble(1) - 0.0487279843444227) < 1e-9)
  }

  test("A4: null counts are all zero") {
    val row = profile.Profiling.nullProfile(raw).head()
    (0 until row.length).foreach(i => assert(row.getLong(i) === 0L))
  }

  test("clean: bmi becomes double, no nulls, id dropped") {
    val cleaned = StrokePipeline.clean(raw)
    assert(!cleaned.columns.contains("id"))
    assert(cleaned.dtypes.toMap.apply("bmi") === "DoubleType")
    assert(cleaned.filter(col("bmi").isNull).count() === 0)
    // imputed constant appears exactly 201 times (the "N/A" rows)
    val m = StrokePipeline.bmiMean(raw)
    assert(cleaned.filter(col("bmi") === m).count() === 201)
  }

  test("encode: category→index maps match FIXTURES.md §A4 goldens (raw)") {
    val enc = StrokePipeline.encode(StrokePipeline.clean(raw))
    val m = enc.mappings
    assert(m("gender") === Map("Male" -> 1.0, "Female" -> 0.0, "Other" -> 2.0))
    assert(m("ever_married") === Map("Yes" -> 0.0, "No" -> 1.0))
    assert(m("work_type") === Map("Private" -> 0.0, "Self-employed" -> 1.0,
      "children" -> 2.0, "Govt_job" -> 3.0, "Never_worked" -> 4.0))
    assert(m("Residence_type") === Map("Urban" -> 0.0, "Rural" -> 1.0))
    assert(m("smoking_status") === Map("never smoked" -> 0.0,
      "Unknown" -> 1.0, "formerly smoked" -> 2.0, "smokes" -> 3.0))
  }

  test("encode: balanced dataset maps differ where frequencies differ") {
    val enc = StrokePipeline.encode(StrokePipeline.clean(balanced))
    val m = enc.mappings
    assert(m("work_type")("Govt_job") === 2.0)
    assert(m("work_type")("children") === 3.0)
    assert(m("smoking_status")("formerly smoked") === 1.0)
    assert(m("smoking_status")("Unknown") === 2.0)
  }

  test("assemble: one-hot widths 3/2/5/2/4 and feature vector size 21") {
    val prepared = StrokePipeline.prepare(spark, StrokePipeline.RawCsv)
    val row = prepared.select("gender", "ever_married", "work_type",
      "Residence_type", "smoking_status", "features").head()
    assert(row.getAs[Vector](0).size === 3)
    assert(row.getAs[Vector](1).size === 2)
    assert(row.getAs[Vector](2).size === 5)
    assert(row.getAs[Vector](3).size === 2)
    assert(row.getAs[Vector](4).size === 4)
    assert(row.getAs[Vector](5).size === 21)
  }
}
