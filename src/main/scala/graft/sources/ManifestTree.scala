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
    * names them, so plain writes suffice for those). Used only for the
    * v1 bootstrap; every subsequent version publishes through
    * [[treeOccCommit]]'s claim discipline.
    */
  private def publishLines(path: String, lines: Seq[String]): Unit = {
    val tmp = java.nio.file.Paths.get(path + ".tmp")
    java.nio.file.Files.write(tmp,
      lines.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Highest committed tree version: max N with a published mlist_N. */
  private[graft] def treeHead(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("mlist_") && n.endsWith(".txt") =>
        n.stripPrefix("mlist_").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)

  /** BUCKETS tree version `v` replaced relative to its parent — the
    * tree's conflict-detection metadata, one granularity coarser than
    * occCommit's file sets (a tree commit swaps whole bucket manifests,
    * so bucket identity IS the conflict unit).
    */
  private[graft] def treeReplacedOf(dir: String, v: Int): Set[Int] = {
    val f = new java.io.File(dir, s"treplaced_$v.txt")
    if (!f.exists()) Set.empty
    else {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().filter(_.nonEmpty).map(_.toInt).toSet
      finally src.close()
    }
  }

  /** OCC commit on the manifest TREE (round-16 verdict #4: the list
    * publish previously bypassed the claim discipline — single-writer
    * only). The [[Snapshots.occCommit]] protocol at bucket granularity:
    *
    *  - conflict check over the intervening versions' replaced-BUCKET
    *    sets (missing metadata = conflict, the fail-on-expired-base
    *    rule); disjoint buckets REBASE — the new list is the CURRENT
    *    head's with our touched refs swapped in, every untouched
    *    bucket's manifest file reused verbatim (line-identical, the
    *    O(touched) commit-metadata contract);
    *  - the slot is claimed with an O_EXCL `mlist_N.txt.claim`;
    *    `treplaced_N.txt` is durable before the list's atomic rename;
    *  - a loser of the claim race waits for the winner's list and
    *    retries the whole check from the new head.
    *
    * New buckets (nk absent from the head's list) append. Returns
    * (committedVersion, claimRetries).
    */
  private[graft] def treeOccCommit(dir: String, readV: Int,
      newRefs: Seq[BucketRef], claimWaitMs: Long = 10000L): (Int, Int) = {
    val touched = newRefs.map(_.nk).toSet
    val byNk = newRefs.map(r => r.nk -> r).toMap
    var retries = 0
    while (true) {
      val h = treeHead(dir)
      if (!new java.io.File(dir, s"mlist_$readV.txt").exists())
        throw new Snapshots.CommitConflictException(
          s"stale base: tree snapshot v$readV expired")
      val metaGone = ((readV + 1) to h).filter(v =>
        !new java.io.File(dir, s"treplaced_$v.txt").exists())
      if (metaGone.nonEmpty)
        throw new Snapshots.CommitConflictException(
          s"stale base: tree conflict metadata expired for " +
            s"version(s) ${metaGone.mkString(",")}")
      val concurrent =
        ((readV + 1) to h).flatMap(treeReplacedOf(dir, _)).toSet
      val overlap = concurrent.intersect(touched)
      if (overlap.nonEmpty)
        throw new Snapshots.CommitConflictException(
          s"concurrent tree commit rewrote bucket(s) ${overlap.mkString(",")}" +
            s" this commit also touches (read v$readV, head v$h)")
      val n = h + 1
      val claim = new java.io.File(dir, s"mlist_$n.txt.claim")
      try {
        java.nio.file.Files.createFile(claim.toPath) // atomic test-and-set
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/treplaced_$n.txt"),
          touched.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
        val rebased = (mlist(dir, h).filterNot(r => touched(r.nk)) ++
          newRefs).sortBy(_.nk)
        val tmp = java.nio.file.Paths.get(s"$dir/mlist_$n.tmp")
        java.nio.file.Files.write(tmp,
          rebased.map(r => s"${r.nk}|${r.bm}|${r.rows}|${r.balLo}|${r.balHi}")
            .mkString("\n").getBytes("UTF-8"))
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(s"$dir/mlist_$n.txt"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return (n, retries)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          retries += 1
          val mf = new java.io.File(dir, s"mlist_$n.txt")
          val deadline = System.nanoTime() + claimWaitMs * 1000000L
          while (!mf.exists() && System.nanoTime() < deadline)
            Thread.sleep(2)
          if (!mf.exists())
            throw new Snapshots.CommitConflictException(
              s"orphaned tree claim for version $n; manual recovery: " +
                "remove " + claim.getPath)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Tree-resolved bucket rewrite (the tree-level cowMerge): credit one
    * bucket's rows, publish through [[treeOccCommit]] with the standard
    * conflict-retry. Returns (version, attempts).
    */
  private[graft] def treeCredit(s: SparkSession, dir: String, nk: Int,
      cents: Long, tag: String, maxAttempts: Int = 10): (Int, Int) =
    treeRewrite(s, dir, nk, tag, maxAttempts)(df =>
      df.withColumn("bal", col("bal") + lit(cents)))

  /** Tree-resolved bucket compaction (the tree-level compactBucket):
    * rewrite the bucket's files as one, content unchanged.
    */
  private[graft] def treeCompactBucket(s: SparkSession, dir: String,
      nk: Int, tag: String, maxAttempts: Int = 10): (Int, Int) =
    treeRewrite(s, dir, nk, tag, maxAttempts, coalesce1 = true)(identity)

  private def treeRewrite(s: SparkSession, dir: String, nk: Int,
      tag: String, maxAttempts: Int, coalesce1: Boolean = false)(
      xform: DataFrame => DataFrame): (Int, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      val h = treeHead(dir)
      val ref = mlist(dir, h).find(_.nk == nk).getOrElse(
        throw new IllegalArgumentException(s"no bucket nk=$nk at tree v$h"))
      val sub = s"$tag${h}a$attempt"
      val base = xform(s.read.parquet(bucketFiles(ref.bm).sorted: _*))
        .select(col("k"), col("nkd"), col("bal"), col("nkd").as("nk"))
      (if (coalesce1) base.coalesce(1) else base.repartition(col("nk")))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/$sub")
      val entries = Snapshots.statsEntries(s, Store.bucketedLeafFiles(dir, sub))
      val bm = s"$dir/bm_nk${nk}_$sub.txt"
      writeLines(bm, entries)
      try return (treeOccCommit(dir, h,
        Seq(bucketRef(nk, bm, entries)))._1, attempt)
      catch {
        case e: Snapshots.CommitConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bucket-level stats roll up from the bucket's file entries: row
    * count plus the value column's [lo, hi] — so a VALUE predicate can
    * prune bucket-manifest FETCHES at the list level, one level above
    * the per-file pruning inside each bucket manifest.
    */
  private def bucketRef(nk: Int, bm: String,
      entries: Seq[String]): BucketRef = {
    val parsed = entries.map(ManifestEntry.parse)
    BucketRef(nk, bm, parsed.flatMap(_.rows).sum,
      parsed.flatMap(_.stats.get("bal")).map(_._1.toLong).min,
      parsed.flatMap(_.stats.get("bal")).map(_._2.toLong).max)
  }

  /** Group stats entries by the bucket their path's `nk=` dir names. */
  private def byBucket(entries: Seq[String]): Map[Int, Seq[String]] = {
    val nkRe = raw"nk=(\d+)".r
    entries.groupBy(e => nkRe.findFirstMatchIn(
      ManifestEntry.parse(e).path).get.group(1).toInt)
  }

  /** Lands the tree store once per customer version: v1 (one bucket
    * manifest per nation + the list), then the v2 bucket-rewrite commit
    * resolved THROUGH the tree. Sidecar `_merge_bm_fetched` records how
    * many bucket manifests the merge actually opened.
    */
  private[graft] def s32Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      // key v2: round-17 routes the v2 publish through treeOccCommit
      // (treplaced metadata now exists) — rebuild superseded layouts
      graft.util.Landing.mtimeKey(d, "customer") + "|mtree2",
      "graft_mtree") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          round(col("c_acctbal") * 100).cast("long").as("bal"))
      base.select(col("k"), col("nk").as("nkd"), col("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val v1ByBucket = byBucket(Snapshots.statsEntries(s, Store.bucketedLeafFiles(dir, "v1")))
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
      val v2ByBucket = byBucket(Snapshots.statsEntries(s, Store.bucketedLeafFiles(dir, "m2")))
      // the v2 publish goes through the tree's OCC claim discipline
      // (round-16 verdict #4): only the TOUCHED buckets' refs ride the
      // commit; untouched refs rebase verbatim inside treeOccCommit
      val refs2touched = v2ByBucket.toSeq.sortBy(_._1)
        .map { case (nk, entries) =>
          val bm = s"$dir/bm_nk${nk}_v2.txt"
          writeLines(bm, entries)
          bucketRef(nk, bm, entries)
        }
      require(treeOccCommit(dir, 1, refs2touched)._1 == 2,
        "the tree demo's merge must land as v2")
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
