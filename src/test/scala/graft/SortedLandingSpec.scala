package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.sources.SortedLanding

/** s11: the sort-ordered landing must (a) be result-transparent and
  * (b) actually SKIP data at the reader — the whole point of the layout.
  * (b) is asserted as a metrics differential: under the identical pushed
  * range filter, the sorted layout's parquet scan emits a small fraction
  * of the rows the unsorted layout's scan emits (row-group/page min-max
  * envelopes are tight only when the file is sorted on the filter key).
  */
class SortedLandingSpec extends SparkSpec {

  /** Rows the parquet reader actually delivered (post row-group/page
    * skipping, pre Spark-side Filter). AQE hides completed stages from
    * plan traversal, so callers scope it off.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }
      .sum
  }

  test("s11: sorted landing skips most rows at the scan; unsorted cannot") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tmp = java.nio.file.Files.createTempDirectory("graft_s11_spec")
    try {
      val ev = Tables.events(spark, Sf001)
      SortedLanding.writeSorted(ev, s"$tmp/sorted", "ts")
      // same file count, hash layout: every file spans the full ts range
      ev.repartition(8).write.parquet(s"$tmp/unsorted")
      def dayScan(path: String): DataFrame =
        spark.read.parquet(path)
          .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      val sortedRows = scanRows(dayScan(s"$tmp/sorted").select("event_id"))
      val unsortedRows = scanRows(dayScan(s"$tmp/unsorted").select("event_id"))
      val total = ev.count()
      // unsorted: no envelope excludes the day → the reader emits ~all rows
      assert(unsortedRows > total / 2,
        s"unsorted scan unexpectedly skipped: $unsortedRows of $total")
      // sorted: only the files/pages covering the day survive
      assert(sortedRows < unsortedRows / 4,
        s"sorted layout did not skip: $sortedRows vs $unsortedRows")
      // and the layouts agree on the answer
      assert(dayScan(s"$tmp/sorted").count() ===
        dayScan(s"$tmp/unsorted").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("s11: landing is memoized per source mtime and re-lands on rewrite") {
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_s11_stale")
    try {
      Files.copy(Paths.get(Sf0001, "events.parquet"),
        tmp.resolve("events.parquet"))
      val first = SortedLanding.landedEvents(spark, tmp.toString)
        .inputFiles.toSet
      assert(SortedLanding.landedEvents(spark, tmp.toString)
        .inputFiles.toSet === first, "memo missed on unchanged source")
      val ev = tmp.resolve("events.parquet")
      Files.setLastModifiedTime(ev, java.nio.file.attribute.FileTime
        .fromMillis(ev.toFile.lastModified() + 5000))
      assert(SortedLanding.landedEvents(spark, tmp.toString)
        .inputFiles.toSet !== first, "stale sorted landing after rewrite")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
