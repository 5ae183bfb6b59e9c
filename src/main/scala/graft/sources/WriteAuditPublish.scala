package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** S27: WRITE-AUDIT-PUBLISH — the staged-commit pattern every serious
  * lakehouse pipeline runs (Iceberg's WAP / branch-audit-publish,
  * popularized by Netflix): a writer lands its files and a CANDIDATE
  * manifest under a stage name readers never resolve (readers key on
  * `manifest_N.txt`; the stage is `manifest_N.txt.audit`), a data-quality
  * audit runs against the STAGED snapshot exactly as a reader would see
  * it, and only a green audit publishes — one atomic rename. A red
  * audit publishes NOTHING: the head never moves, the bad data is
  * structurally invisible (not rolled back — never visible at all), and
  * the orphaned stage files are ordinary vacuum fodder.
  *
  * The audit here is the dq-family contract applied at the gate: key
  * uniqueness, value domain (balances above [[BalFloor]] — the TPC-H
  * domain legitimately includes negatives, so the rule audits the
  * DOMAIN, not a naive non-negativity), and row-count conservation
  * against the parent snapshot. At 100 TB this pattern is why bad loads don't
  * page anyone at 3am: the audit costs one scan of the CANDIDATE (not
  * the table — COW means the candidate shares unchanged files, and the
  * audit can scan only the changed buckets plus metadata), and
  * publish/reject are both metadata-only.
  */
object WriteAuditPublish {

  /** Domain floor for the range audit: TPC-H balances are legitimately
    * negative down to -99999 cents, so the rule is "within the domain",
    * not "non-negative" — an audit stricter than the domain would
    * reject clean loads.
    */
  private[graft] val BalFloor = -100000L

  /** Audit a staged manifest's table as a reader would see it. Returns
    * (dupKeys, outOfDomain, rowDelta) — all must be zero to publish.
    */
  private[graft] def audit(s: SparkSession, dir: String,
      stagedManifest: Seq[String], parentRows: Long)
      : (Long, Long, Long) = {
    val t = s.read.parquet(stagedManifest: _*)
    val r = t.agg(
      (count(lit(1)) - countDistinct(col("k"))).as("dups"),
      sum(when(col("bal") < BalFloor, 1L).otherwise(0L)).as("oob"),
      count(lit(1)).as("n")).first()
    (r.getLong(0), r.getLong(1), r.getLong(2) - parentRows)
  }

  /** Unique suffix per staged candidate — two concurrent publishers at
    * the same head must not clobber each other's stage file.
    */
  private val stageSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Stage → audit → publish-or-reject. The staged manifest lives at
    * `manifest_<n>.txt.audit.<tok>` (invisible: [[Snapshots.head]]
    * matches only `.txt`); publish takes the version slot with the
    * occCommit O_EXCL claim FIRST (round-15 advice: a bare ATOMIC_MOVE
    * onto `manifest_N.txt` is a silent POSIX rename replace — two
    * concurrent publishers picking the same N would lose one audited-
    * green commit), then renames the stage in. A publisher that loses
    * the claim race waits for the winner's manifest and re-runs the
    * WHOLE stage+audit from the new head — the audit's row-conservation
    * premise is against the parent snapshot, so a moved head invalidates
    * it. A red audit never claims a slot at all: rejects consume
    * nothing. Returns true iff published.
    */
  private[graft] def auditedPublish(s: SparkSession, dir: String,
      files: Seq[String], auditLog: StringBuilder,
      claimWaitMs: Long = 10000L): Boolean = {
    while (true) {
      val h = Snapshots.head(dir)
      val parentRows = s.read.parquet(Snapshots.manifest(dir, h): _*).count()
      val n = h + 1
      val stage = java.nio.file.Paths.get(
        s"$dir/manifest_$n.txt.audit.${stageSeq.incrementAndGet()}")
      java.nio.file.Files.write(stage,
        files.sorted.mkString("\n").getBytes("UTF-8"))
      val (dups, oob, delta) = audit(s, dir, files, parentRows)
      val ok = dups == 0 && oob == 0 && delta == 0
      auditLog.append(s"candidate $n: dups=$dups outOfDomain=$oob " +
        s"rowDelta=$delta -> ${if (ok) "PUBLISH" else "REJECT"}\n")
      if (!ok) {
        // a rejected candidate's stage file is garbage NOW, not vacuum
        // fodder later (round-16 advice: metadata orphans accumulated
        // unbounded in long-lived stores)
        java.nio.file.Files.deleteIfExists(stage)
        return false
      }
      val claim = new java.io.File(dir, s"manifest_$n.txt.claim")
      try {
        java.nio.file.Files.createFile(claim.toPath) // atomic test-and-set
        // conflict metadata durable BEFORE the manifest is visible (the
        // occCommit ordering discipline): a WAP version replaces exactly
        // the parent files its candidate no longer lists, and recording
        // that lets a later occCommit detect conflicts across WAP
        // versions instead of failing on missing metadata
        val candidate = files.toSet
        val replaced = Snapshots.manifest(dir, h).filterNot(candidate)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/replaced_$n.txt"),
          replaced.sorted.mkString("\n").getBytes("UTF-8"))
        java.nio.file.Files.move(stage,
          java.nio.file.Paths.get(s"$dir/manifest_$n.txt"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          // lost the slot: drop our stage file (a fresh one is staged on
          // retry), wait for the winner's publish (claims here are only
          // ever taken by green candidates about to rename), then
          // re-stage and RE-AUDIT against the new head
          java.nio.file.Files.deleteIfExists(stage)
          val mf = new java.io.File(dir, s"manifest_$n.txt")
          val deadline = System.nanoTime() + claimWaitMs * 1000000L
          while (!mf.exists() && System.nanoTime() < deadline)
            Thread.sleep(2)
          if (!mf.exists())
            throw new Snapshots.CommitConflictException(
              s"orphaned claim for version $n (claimant died mid-" +
                "publish); manual recovery: remove " + claim.getPath)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def nkFiles(m: Seq[String], nk: Int): Seq[String] = {
    val sep = java.io.File.separator
    m.filter(_.contains(s"${sep}nk=$nk$sep"))
  }

  /** Lands the WAP demo once per customer version: v1 base; a CLEAN
    * candidate (nation-5 bucket credited +500, row-conserving) that
    * audits green and publishes as v2; a DIRTY candidate (nation-8
    * bucket rewritten with negated balances and a duplicated key) that
    * audits red and is REJECTED — head stays 2, the dirty files never
    * become reader-visible. The audit log lands as `_audit_log.txt`.
    */
  private[graft] def s27Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      // key v2: the round-17 publish also records replaced-file
      // metadata and cleans rejected stages — rebuild superseded layouts
      graft.util.Landing.mtimeKey(d, "customer") + "|wapstore2",
      "graft_wap") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
          round(col("c_acctbal") * 100).cast("long").as("bal"))
      base.select(col("k"), col("nk").as("nkd"), col("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val m1 = Store.bucketedLeafFiles(dir, "v1")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        m1.mkString("\n").getBytes("UTF-8"))
      val log = new StringBuilder
      // clean candidate: COW rewrite of the nation-5 bucket, +500
      base.filter(col("nk") === 5)
        .select(col("k"), col("nk").as("nkd"),
          (col("bal") + 500L).as("bal"), col("nk"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/clean")
      val clean = (m1.filterNot(nkFiles(m1, 5).toSet) ++
        Store.bucketedLeafFiles(dir, "clean")).sorted
      require(auditedPublish(s, dir, clean, log),
        "clean candidate must publish")
      // dirty candidate: nation-8 bucket rewritten with out-of-domain
      // balances plus a duplicated key — violations on every audit axis
      // (rows also grow by one)
      val n8 = base.filter(col("nk") === 8)
      n8.select(col("k"), col("nk").as("nkd"),
          (col("bal") - 10000000L).as("bal"), col("nk"))
        .unionByName(n8.limit(1).select(col("k"), col("nk").as("nkd"),
          (col("bal") - 10000000L).as("bal"), col("nk")))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/dirty")
      val m2 = Snapshots.manifest(dir, 2)
      val dirty = (m2.filterNot(nkFiles(m2, 8).toSet) ++
        Store.bucketedLeafFiles(dir, "dirty")).sorted
      require(!auditedPublish(s, dir, dirty, log),
        "dirty candidate must be rejected")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_audit_log.txt"),
        log.toString.getBytes("UTF-8"))
    }

  /** S27: the registered WAP read — the head snapshot (clean credit
    * applied, dirty batch never visible) with the gate's structural
    * outcomes as columns: `n_published` (the rejected candidate did not
    * advance the head), `clean_published` / `dirty_rejected` (from the
    * audit log), and the exact head aggregate the oracle recomputes
    * (base + the clean credit ONLY — the hash gate fails if rejected
    * data ever leaks into a reader-visible snapshot).
    */
  private def s27WriteAuditPublish(s: SparkSession, d: String)
      : DataFrame = {
    val dir = s27Dir(s, d)
    val h = Snapshots.head(dir)
    val log = {
      val src = scala.io.Source.fromFile(s"$dir/_audit_log.txt")
      try src.mkString finally src.close()
    }
    Snapshots.readVersion(s, dir, h)
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"))
      .select(lit(h.toLong).as("n_published"), col("n_rows"),
        col("bal_cents"),
        lit(log.contains("candidate 2") &&
          log.contains("PUBLISH")).as("clean_published"),
        lit(log.contains("candidate 3") &&
          log.contains("REJECT")).as("dirty_rejected"))
  }

  private val s27Sql =
    """SELECT CAST(2 AS BIGINT) AS n_published,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)
      |    + CASE WHEN c_nationkey = 5 THEN 500 ELSE 0 END) AS BIGINT)
      |    AS bal_cents,
      |  TRUE AS clean_published, TRUE AS dirty_rejected
      |FROM customer""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s27_write_audit_publish" -> Q(s27WriteAuditPublish, Some(s27Sql)),
  )
}
