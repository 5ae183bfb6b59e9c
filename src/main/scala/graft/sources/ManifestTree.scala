package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** S32: TWO-LEVEL MANIFEST TREE — the metadata layer a million-file
  * table needs (round-15 verdict #6): every other store here reads ONE
  * flat manifest driver-side, fine at ≤ dozens of files but O(|table
  * files|) per read on a 100 TB table. Iceberg's answer is a tree: a
  * snapshot points at a MANIFEST LIST (one line per bucket/partition
  * range, carrying bucket-level stats), and each line points at a
  * PER-BUCKET MANIFEST enumerating that bucket's data files with their
  * file-level stats. A selective read parses the list (O(|buckets|)),
  * fetches ONLY the bucket manifests the predicate intersects, and
  * scans only their files; a merge resolves its touched buckets the
  * same way and REUSES every untouched bucket's manifest file verbatim
  * in the next version's list — commit metadata cost is O(touched
  * buckets), not O(table).
  *
  * Layout on disk (all driver-readable text, every publish a distinct
  * file — the s16 immutability discipline):
  *   mlist_<V>.txt            one `nk|bmPath|rows|bal_lo|bal_hi` line
  *                            per bucket (value stats roll up from the
  *                            bucket's file entries, so a value
  *                            predicate prunes bucket-manifest FETCHES)
  *   bm_nk<k>_v<V>.txt        stats entries (Snapshots format) for the
  *                            files bucket k holds AS OF version V —
  *                            written only when V changed bucket k
  *   v1/, m2/                 the data files themselves
  *
  * The demo: customer bucketed by nation; the v2 commit credits every
  * nk%5==2 customer +777 cents — a pure bucket rewrite resolved
  * through the tree (the build records how many bucket manifests the
  * MERGE fetched; the spec pins it to |touched|, not |buckets|).
  */
object ManifestTree {

  final case class BucketRef(nk: Int, bm: String, rows: Long,
      balLo: Long, balHi: Long)

  private[graft] val CreditCents = 777L

  private[graft] def mlist(dir: String, v: Int): Seq[BucketRef] = {
    val src = scala.io.Source.fromFile(s"$dir/mlist_$v.txt")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val p = l.split('|')
      BucketRef(p(0).toInt, p(1), p(2).toLong, p(3).toLong, p(4).toLong)
    }.toList
    finally src.close()
  }

  /** One bucket manifest's file list (entry paths, stats stripped). */
  private[graft] def bucketFiles(bm: String): Seq[String] = {
    val src = scala.io.Source.fromFile(bm)
    try src.getLines().filter(_.nonEmpty)
      .map(Snapshots.pathOf).toList
    finally src.close()
  }

  private def writeLines(path: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))

  /** The manifest LIST is the commit point — it must appear fully
    * written or not at all (bucket manifests are inert until a list
    * names them, so plain writes suffice for those). Single writer per
    * store assumed for the demo; a concurrent-writer tree would claim
    * the slot with the occCommit O_EXCL discipline first.
    */
  private def publishLines(path: String, lines: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Bucket-level stats roll up from the bucket's file entries: row
    * count plus the value column's [lo, hi] — so a VALUE predicate can
    * prune bucket-manifest FETCHES at the list level, one level above
    * the per-file pruning inside each bucket manifest.
    */
  private def bucketRef(nk: Int, bm: String,
      entries: Seq[String]): BucketRef = {
    val parts = entries.map(_.split('|'))
    BucketRef(nk, bm, parts.map(_(5).toLong).sum,
      parts.map(_(3).toLong).min, parts.map(_(4).toLong).max)
  }

  /** Group stats entries by the bucket their path's `nk=` dir names. */
  private def byBucket(entries: Seq[String]): Map[Int, Seq[String]] = {
    val nkRe = raw"nk=(\d+)".r
    entries.groupBy(e =>
      nkRe.findFirstMatchIn(Snapshots.pathOf(e)).get.group(1).toInt)
  }

  private def leafFiles(dir: String, sub: String): Seq[String] =
    Option(new java.io.File(s"$dir/$sub").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("nk="))
      .flatMap(pd => pd.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath))
      .toSeq.sorted

  /** Lands the tree store once per customer version: v1 (one bucket
    * manifest per nation + the list), then the v2 bucket-rewrite commit
    * resolved THROUGH the tree. Sidecar `_merge_bm_fetched` records how
    * many bucket manifests the merge actually opened.
    */
  private[graft] def s32Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|mtree",
      "graft_mtree") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          round(col("c_acctbal") * 100).cast("long").as("bal"))
      base.select(col("k"), col("nk").as("nkd"), col("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val v1ByBucket = byBucket(Snapshots.statsEntries(s, leafFiles(dir, "v1")))
      val refs1 = v1ByBucket.toSeq.sortBy(_._1).map { case (nk, entries) =>
        val bm = s"$dir/bm_nk${nk}_v1.txt"
        writeLines(bm, entries)
        bucketRef(nk, bm, entries)
      }
      publishLines(s"$dir/mlist_1.txt",
        refs1.map(r => s"${r.nk}|${r.bm}|${r.rows}|${r.balLo}|${r.balHi}"))
      // ---- the v2 commit, resolved through the TREE -------------------
      val touched = refs1.map(_.nk).filter(_ % 5 == 2).toSet
      // merge-side metadata fetch: ONLY the touched buckets' manifests
      val touchedRefs = mlist(dir, 1).filter(r => touched(r.nk))
      val inputFiles = touchedRefs.flatMap(r => bucketFiles(r.bm))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_merge_bm_fetched"),
        touchedRefs.size.toString.getBytes("UTF-8"))
      s.read.parquet(inputFiles.sorted: _*)
        .withColumn("bal", col("bal") + lit(CreditCents))
        .select(col("k"), col("nkd"), col("bal"), col("nkd").as("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/m2")
      val v2ByBucket = byBucket(Snapshots.statsEntries(s, leafFiles(dir, "m2")))
      val refs2 = refs1.map { r =>
        if (!touched(r.nk)) r // untouched: the v1 bucket manifest VERBATIM
        else {
          val entries = v2ByBucket(r.nk)
          val bm = s"$dir/bm_nk${r.nk}_v2.txt"
          writeLines(bm, entries)
          bucketRef(r.nk, bm, entries)
        }
      }
      publishLines(s"$dir/mlist_2.txt",
        refs2.map(r => s"${r.nk}|${r.bm}|${r.rows}|${r.balLo}|${r.balHi}"))
    }

  /** The tree-pruned read: parse the list (O(|buckets|) driver lines),
    * fetch ONLY the bucket manifests inside [nkLo, nkHi], read their
    * files. Returns (frame, bucketManifestsParsed, bucketManifestsTotal).
    */
  private[graft] def treePrunedRead(s: SparkSession, dir: String, v: Int,
      nkLo: Int, nkHi: Int, balMin: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    val refs = mlist(dir, v)
    require(refs.nonEmpty,
      s"empty manifest list mlist_$v.txt in $dir — no schema source " +
        "for an all-pruned read")
    val kept = refs.filter(r => r.nk >= nkLo && r.nk <= nkHi &&
      balMin.forall(m => r.balHi >= m))
    val files = kept.flatMap(r => bucketFiles(r.bm))
    val df =
      if (files.nonEmpty) s.read.parquet(files.sorted: _*)
      else s.read.parquet(bucketFiles(refs.head.bm).head)
        .filter(lit(false))
    (df, kept.size, refs.size)
  }

  /** S32: the registered tree read — a selective nation-range aggregate
    * over the post-commit head, served by parsing the manifest LIST plus
    * only the matching per-bucket manifests (gate: strictly fewer bucket
    * manifests than buckets). The oracle recomputes the credited table
    * and the same range from raw customer, so the hash gate fails if the
    * tree loses a file, double-lists one, or serves a stale bucket.
    *
    * At 100 TB with a million files over 10k buckets: the flat-manifest
    * read costs a million driver lines per query; the tree costs 10k
    * list lines + the matched buckets' manifests — and commit metadata
    * is O(touched buckets) because untouched bucket manifests are reused
    * byte-identical (spec-pinned by path equality across versions).
    */
  private def s32ManifestTree(s: SparkSession, d: String): DataFrame = {
    val dir = s32Dir(s, d)
    val (df, kept, total) = treePrunedRead(s, dir, 2, 10, 14)
    df.groupBy(col("nkd").cast("int").as("nk"))
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
      .select(col("nk"), col("n_rows"), col("bal_cents"),
        lit(kept < total).as("skipped_buckets"),
        lit(kept > 0).as("read_some"))
      .orderBy(col("nk"))
  }

  private val s32Sql =
    """SELECT CAST(c_nationkey AS INTEGER) AS nk,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |    + CASE WHEN c_nationkey % 5 = 2 THEN 777 ELSE 0 END) AS BIGINT)
      |    AS bal_cents,
      |  TRUE AS skipped_buckets, TRUE AS read_some
      |FROM customer WHERE c_nationkey BETWEEN 10 AND 14
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s32_manifest_tree" -> Q(s32ManifestTree, Some(s32Sql)),
  )
}
