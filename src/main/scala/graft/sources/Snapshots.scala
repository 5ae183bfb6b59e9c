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

  /** The pinned file list of a version — a bounded driver read
    * (≤ |nations| lines), the manifest-fetch cost model.
    */
  private[graft] def manifest(dir: String, v: Int): Seq[String] = {
    val src = scala.io.Source.fromFile(s"$dir/manifest_$v.txt")
    try src.getLines().toList finally src.close()
  }

  private[graft] def readVersion(s: SparkSession, dir: String,
      v: Int): DataFrame =
    s.read.parquet(manifest(dir, v): _*)

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

  val qs: Seq[(String, Q)] = Seq(
    "s16_snapshot_read" -> Q(s16SnapshotRead, Some(s16Sql)),
    "s18_snapshot_vacuum" -> Q(s18SnapshotVacuum, Some(s18Sql)),
  )
}
