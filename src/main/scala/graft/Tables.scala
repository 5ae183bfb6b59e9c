package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's TPC-H-ish parquet testdata (TESTDATA.md).
  *
  * Schemas are fixed by the driver (FIXTURES.md §B); we read them as-is and
  * let the vectorized parquet reader + Catalyst handle pruning/pushdown.
  * At 100 TB these would be partitioned tables behind a catalog; the loader
  * is the single seam where that swap happens.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Loaded-frame memo per (session, dir, table, mtime): `spark.read
  // .parquet` pays a driver-side footer read + file-index build on EVERY
  // call (~40-70 ms each, single-threaded), and the bench re-builds each
  // query's frame per rep — multi-table queries were spending more wall
  // time re-inferring schemas than executing (PhaseProbe r18: TPC-H
  // builds 0.6-0.75 s of ~1 s totals). A DataFrame is an immutable plan,
  // so handing the same one back is pure plan reuse — every action still
  // scans the parquet; nothing is cached. mtime in the key keeps the
  // ScaleSweep rebuild / driver-regen cases correct (stagedDirs
  // discipline), and the session in the key isolates concurrent
  // sessions (specs vs mains).
  private val tMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String, Long), DataFrame]

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val mtime =
      try java.nio.file.Files
        .getLastModifiedTime(java.nio.file.Paths.get(path)).toMillis
      catch { case _: java.io.IOException => -1L }
    tMemo.getOrElseUpdate((spark, dir, name, mtime),
      spark.read.parquet(path))
  }

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** The driver has shipped events.parquet with two `ts` encodings across
    * rounds: TIMESTAMP(NANOS) — which Spark's TimestampType (µs) rejects
    * outright, so it is read as long via the legacy runtime SQLConf and
    * truncated to µs with exact integer arithmetic (lossless: the testdata
    * has no sub-µs components) — and plain TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ. Both are
    * normalized to TimestampType here (session tz is UTC everywhere, so the
    * NTZ→LTZ cast is value-identical), keeping every downstream operator
    * encoding-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, d, "events"))
  }

  /** Normalize an events frame's `ts` to TimestampType whatever the parquet
    * encoding produced (see [[events]]). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType         =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
