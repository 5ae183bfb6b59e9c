package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** S23: file-level column statistics in the manifest + DATA-SKIPPING
  * reads — the metadata leg of the manifest store (round-14 verdict #2):
  * s16/s22 manifests list files, so a selective read still opens every
  * live file's footer. Every production table format instead records
  * per-file min/max column stats AT COMMIT TIME (Iceberg manifest
  * entries, Delta add-action stats) and prunes the file list DRIVER-SIDE
  * before the scan ever reaches the filesystem.
  *
  * Expressed directly: the landed layout range-partitions orders by
  * order date into ~[[S23Files]] files (the natural time-clustered
  * landing — [[SortedLanding]]'s layout argument at file rather than
  * row-group granularity), and the commit writes one manifest line per
  * file carrying `path|min_od|max_od|rows`. Dates are ISO STRINGS, so
  * min/max compare lexicographically-chronologically and the INT96
  * no-stats trap (the SortedLanding lesson) cannot apply. A stats-pruned
  * read parses the manifest (bounded driver work, one line per file),
  * keeps exactly the files whose [min,max] interval intersects the
  * predicate's, and hands Spark the kept list — file-LISTING-level
  * skipping, before any I/O, composing with (not replacing) the
  * row-group pruning the parquet reader does inside each kept file via
  * the residual pushed filter.
  *
  * At 100 TB this is the difference between a selective query costing
  * O(matching files) and O(all files): a year-window query over a
  * time-clustered 7-year table reads ~1/7 of the file list, and the
  * decision costs one driver manifest parse — no footer opens, no tasks,
  * no listing of skipped files. Stats collection costs one columnar
  * aggregate over the landed data at commit time, amortized per version
  * (the landedLayout accounting).
  */
object FileStats {

  private[graft] val S23Files = 16

  /** Landed once per orders version: the range-clustered data files plus
    * the stats manifest (`stats_1.txt`, one `path|min|max|rows` line per
    * file).
    */
  private[graft] def s23Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "orders") + "|statskip",
      "graft_statskip") { dir =>
      Tables.orders(s, d)
        .select(col("o_orderkey").as("ok"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .repartitionByRange(S23Files, col("od"), col("ok"))
        .write.mode("overwrite").parquet(s"$dir/data")
      // commit-time stats: one aggregate pass over the landed files
      // (≤ S23Files result rows — bounded driver collect)
      val lines = s.read.parquet(s"$dir/data")
        .groupBy(input_file_name().as("f"))
        .agg(min(col("od")).as("lo"), max(col("od")).as("hi"),
          count(lit(1)).as("n"))
        .collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}|${r.getString(2)}|${r.getLong(3)}")
        .sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/stats_1.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

  /** Parsed stats manifest: (path, min_od, max_od, rows) per live file. */
  private[graft] def stats(dir: String): Seq[(String, String, String, Long)] = {
    val src = scala.io.Source.fromFile(s"$dir/stats_1.txt")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val p = l.split('|')
      (p(0), p(1), p(2), p(3).toLong)
    }.toList
    finally src.close()
  }

  /** The data-skipping read: keep exactly the files whose [min,max]
    * interval intersects [loIncl, hiExcl). Returns the pruned frame plus
    * (kept, total) file counts for the structural gate columns. The
    * caller still applies the row predicate — file stats prune at FILE
    * granularity; the residual filter reaches the parquet reader as a
    * pushed filter over only the kept files.
    */
  private[graft] def statsPrunedRead(s: SparkSession, dir: String,
      loIncl: String, hiExcl: String): (DataFrame, Int, Int) = {
    val st = stats(dir)
    val kept = st.filter { case (_, lo, hi, _) =>
      hi >= loIncl && lo < hiExcl }
    // a window intersecting NO file still returns an empty frame with
    // the table schema (round-15 advice: zero paths would throw
    // UNABLE_TO_INFER_SCHEMA) — one known file, constant-false filter
    val df =
      if (kept.nonEmpty) s.read.parquet(kept.map(_._1): _*)
      else s.read.parquet(st.head._1).filter(lit(false))
    (df, kept.size, st.size)
  }

  /** S23: the registered data-skipping read — an exact one-year
    * aggregate served through the pruned file list, with the skipping
    * itself pinned as structural boolean columns (the bounded-gate
    * pattern): `skipped_files` (the driver pruned at least one file
    * without opening it) and `pruned_complete` (the kept files hold
    * every matching row — the aggregate equals the full-scan answer,
    * which the oracle recomputes from the raw table).
    */
  private def s23StatsSkipping(s: SparkSession, d: String): DataFrame = {
    val dir = s23Dir(s, d)
    val (df, nKept, nAll) = statsPrunedRead(s, dir,
      "1996-01-01", "1997-01-01")
    df.filter(col("od") >= "1996-01-01" && col("od") < "1997-01-01")
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .select(col("n_rows"), col("sum_cents"),
        lit(nKept < nAll).as("skipped_files"),
        lit(nKept > 0).as("read_some"))
  }

  private val s23Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  TRUE AS skipped_files, TRUE AS read_some
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01'""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s23_stats_skipping" -> Q(s23StatsSkipping, Some(s23Sql)),
  )
}
