package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins Tables.normalizeTs across every `ts` encoding the driver's testdata
  * has shipped (TIMESTAMP(NANOS)-as-long in rounds ≤5, TIMESTAMP_NTZ since
  * the 2026-08-13 regen) — a future drop that flips the encoding again must
  * land on the TimestampType contract, not on 40 failing queries.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeTs: nanos-as-long is truncated to µs TimestampType") {
    val df = Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    val got = out.select(unix_micros(col("ts"))).head.getLong(0)
    assert(got === 1700000000123456L, "nanos must truncate exactly to µs")
  }

  test("normalizeTs: TIMESTAMP_NTZ casts to value-identical TimestampType") {
    val df = Seq(Tuple1(1L)).toDF("id")
      .withColumn("ts", to_timestamp_ntz(lit("2024-03-01 12:34:56.789")))
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType === TimestampType)
    // session tz is UTC (SparkSpec) — the wall-clock reading must not move
    assert(out.select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .head.getString(0) === "2024-03-01 12:34:56.789")
  }

  test("normalizeTs: TimestampType passes through untouched") {
    val df = Seq(Tuple1(1L)).toDF("id")
      .withColumn("ts", to_timestamp(lit("2024-03-01 12:34:56")))
    assert(Tables.normalizeTs(df).schema("ts").dataType === TimestampType)
  }

  test("events loader lands TimestampType whatever the parquet encoding") {
    val ev = Tables.events(spark, Sf0001)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
  }
}
