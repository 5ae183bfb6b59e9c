package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Det.{dsum, sqlDsum}

/** Small-file compaction (s13): the lakehouse maintenance job every
  * streaming/incremental landing eventually needs. Micro-batch sinks
  * (e16's upsert log, dedupToFileSink) and per-partition writers land
  * many small files; scans then pay one task + one footer-read per
  * file, and at 100 TB the NameNode/listing cost alone dominates.
  * Compaction reads the fragmented landing and rewrites it at a target
  * file size, content-identical.
  *
  * Mechanics: the target file count is derived from the landing's
  * ACTUAL on-disk bytes (sum of file sizes / target), never a guessed
  * row count — parquet compression decides bytes-per-row, so bytes are
  * the only honest unit. The rewrite is one `repartition(n)` round-robin
  * exchange — full shuffle of the data ONCE, which is the price of
  * perfect output sizing; at scale, compact per PARTITION DIRECTORY
  * (date=…) independently so each job's shuffle is one partition's
  * bytes and partition pruning is preserved. Trade-off vs `coalesce`:
  * coalesce avoids the shuffle but inherits input skew (it can only
  * merge, and merges adjacent input splits); a maintenance job whose
  * whole purpose is uniform output uses the shuffle.
  *
  * The registered query is a bounded gate (a7/a10 pattern): exact
  * engine-neutral payload (row count + decimal value sum recomputed
  * from the COMPACTED files) plus flags — fragmented landing really was
  * fragmented (64 files), compacted output really is fewer files, and
  * nothing was invented or lost (the oracle recomputes the payload from
  * the raw events table; equality IS the no-loss proof).
  */
object Compaction {

  private val FragmentFiles = 64

  // Fragmented landing staged once per (source dir, mtime) — same
  // lifecycle discipline as Bucketed/SortedLanding (util.Landing).
  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))

  private def fragmentedLanding(s: SparkSession, d: String): String = {
    val key = graft.util.Landing.mtimeKey(d, "events")
    staged.getOrElseUpdate(key, {
      val out = graft.util.Landing
        .tempDirOnce("graft_fragmented").toString
      Tables.events(s, d)
        .repartition(FragmentFiles)
        .write.mode("overwrite").parquet(out)
      out
    })
  }

  /** Compact `inDir` to ~`targetBytes`-sized files; returns the output
    * dir. File count = ceil(actual bytes / target), floor 1.
    */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bytes = parquetFiles(inDir).map(_.length()).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
  }

  private def s13Compaction(s: SparkSession, d: String): DataFrame = {
    val frag = fragmentedLanding(s, d)
    val out = graft.util.Landing.tempDirOnce("graft_compacted").toString
    compact(s, frag, out, targetBytes = 8L << 20)
    val before = parquetFiles(frag).length
    val after = parquetFiles(out).length
    // payload recomputed from the COMPACTED files: count + exact sum —
    // if compaction dropped or duplicated anything, these diverge from
    // the oracle's recompute over the raw table
    s.read.parquet(out)
      .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("sum_value"))
      .select(col("n_rows"), col("sum_value"),
        lit(before == FragmentFiles).as("was_fragmented"),
        lit(after < before).as("fewer_files"))
  }

  private val s13Sql =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |  ${sqlDsum("value")} AS sum_value,
       |  TRUE AS was_fragmented, TRUE AS fewer_files
       |FROM events""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s13_compaction" -> Q(s13Compaction, Some(s13Sql)),
  )
}
