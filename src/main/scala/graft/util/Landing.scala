package graft.util

import java.nio.file.{Files, Path}
import scala.collection.concurrent.TrieMap

/** Shared landing-lifecycle helpers: every operator that materializes a
  * layout (bucketed tables, sorted parquet, sink round-trips, digest
  * indexes) needs the same two disciplines, so they live once here —
  *  1. temp dirs removed on JVM exit (Verify + Bench + suites share
  *     sessions; a leak per call compounds),
  *  2. staleness keys that include the SOURCE mtime, so a rewritten
  *     source re-lands instead of serving a stale layout for the rest of
  *     the JVM.
  */
object Landing {

  /** One temp directory, deleted recursively on JVM exit. */
  def tempDirOnce(prefix: String): Path = {
    val dir = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    dir
  }

  /** One temp dir per memo key, deleted on JVM exit. */
  def tempDir(memo: TrieMap[String, Path], key: String,
      prefix: String): Path =
    memo.getOrElseUpdate(key, tempDirOnce(prefix))

  /** Staleness key for a single-file parquet source: identity + mtime. */
  def mtimeKey(src: String, table: String): String =
    s"$src|$table|${new java.io.File(s"$src/$table.parquet").lastModified()}"

  /** Amortized DataFrame landing (the j6 production-accounting pattern
    * for derived FRAMES rather than written layouts): materialize `build`
    * once per (session, key) via an eager localCheckpoint and serve the
    * checkpointed frame to every later caller in the JVM. A production MV
    * would land a ranked/seeded frame once per source version, not once
    * per downstream query — keying on the source mtime (callers pass
    * [[mtimeKey]]) reproduces exactly that accounting, and a rewritten
    * source re-lands instead of serving stale ranks. Entries of stopped
    * sessions are dropped on every access (the StrokePipeline.prepare
    * discipline) so a long-lived JVM never pins frames of dead contexts.
    * Intended for SMALL derived frames (ranked ids, seed rows): the memo
    * reference keeps the checkpoint blocks alive for the session's life.
    */
  private val frames =
    TrieMap.empty[(org.apache.spark.sql.SparkSession, String),
      org.apache.spark.sql.DataFrame]

  def frameLanding(spark: org.apache.spark.sql.SparkSession, key: String)(
      build: => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    frames.keySet.filter(_._1.sparkContext.isStopped)
      .foreach(frames.remove)
    frames.getOrElseUpdate((spark, key), build.localCheckpoint(true))
  }

  /** Latest mtime across a source dir's files (multi-table landings). */
  def sourceMtime(dir: String, tables: Seq[String]): Long =
    tables.map(t => new java.io.File(dir, s"$t.parquet").lastModified()).max
}
