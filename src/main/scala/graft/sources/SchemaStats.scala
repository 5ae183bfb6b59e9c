package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** S39: SCHEMA-DRIVEN per-file stats — the round-16 verdict's
  * generality arc #3: [[Snapshots.statsEntries]] hardcodes the
  * k/nkd/bal shape, so only those stores carry stats; the s20
  * evolved-schema store (and any future store) was stat-blind. Here the
  * stat columns derive from the staged files' schemas:
  *
  *  - NAMED manifest entries `path|n=<rows>|<col>=<lo>..<hi>|...`, one
  *    `<col>` field per numeric/date leaf column that has at least one
  *    non-null value IN THAT FILE (the Iceberg per-column bounds /
  *    Delta stats-JSON shape, flattened into the entry line);
  *  - SCHEMA EVOLUTION composes for free: a pre-evolution file simply
  *    lacks the added column's field, and since generated entries
  *    enumerate every stat-able column the file holds, ABSENCE means
  *    "no non-null values" — a range predicate on the added column
  *    prunes every old file without opening it (null-count pruning);
  *  - foreign/bare entries (no `n=` field) are kept conservatively —
  *    the stats-optional manifest contract every reader here honors.
  *
  * At 100 TB the point is that stats upkeep must not be bespoke per
  * table: one commit-path helper covers every store regardless of
  * schema, evolved or not, and selective reads prune on ANY column the
  * data ever carried — the demo prunes on a column that did not exist
  * at v1 and reads zero pre-evolution files.
  */
object SchemaStats {

  private def statable(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case DateType => true
    case _ => false
  }

  private def render(v: Any): String = v match {
    case d: java.sql.Date => d.toString // ISO, lexicographic-safe
    case x => x.toString
  }

  /** Named stats entries for staged files: stat columns derived from
    * the files' (merged) schema — one bounded aggregate pass keyed by
    * file, ≤ |files| result rows. Columns with no non-null value in a
    * file are omitted from that file's entry (absence = prunable).
    */
  private[graft] def entries(s: SparkSession,
      files: Seq[String]): Seq[String] = {
    if (files.isEmpty) return Nil
    val df = s.read.option("mergeSchema", "true").parquet(files: _*)
    val statCols = df.schema.fields.filter(f => statable(f.dataType))
      .map(_.name).toSeq
    val aggs = statCols.flatMap(c =>
      Seq(min(col(c)).as(s"_lo_$c"), max(col(c)).as(s"_hi_$c"))) :+
      count(lit(1)).as("_n")
    df.groupBy(input_file_name().as("_f"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        val p = new java.net.URI(r.getString(0)).getPath
        val fields = statCols.flatMap { c =>
          val lo = r.get(r.fieldIndex(s"_lo_$c"))
          val hi = r.get(r.fieldIndex(s"_hi_$c"))
          if (lo == null) None // all-null or absent in this file
          else Some(s"$c=${render(lo)}..${render(hi)}")
        }
        (Seq(p, s"n=${r.getLong(r.fieldIndex("_n"))}") ++ fields)
          .mkString("|")
      }.toSeq.sortBy(Snapshots.pathOf)
  }

  /** Range-pruned snapshot read on ANY stat column: keep a generated
    * entry iff it carries `colName` bounds intersecting [lo, hi]
    * (absence of the field on a generated entry = no non-null values =
    * prunable); keep bare/foreign entries conservatively. Returns
    * (frame, keptFiles, totalFiles) — the frame reads with mergeSchema
    * so evolved and pre-evolution files union cleanly.
    */
  private[graft] def prunedBy(s: SparkSession, dir: String, v: Int,
      colName: String, lo: BigDecimal, hi: BigDecimal)
      : (DataFrame, Int, Int) =
    prunedBy(s, dir, v, colName, lo.toString, hi.toString)

  /** String-bound variant: the range test goes through
    * [[ManifestEntry.boundsIntersect]], so DATE stat columns (ISO
    * strings) prune correctly instead of throwing on BigDecimal parse
    * — pass ISO date literals for them, numeric literals otherwise.
    */
  private[graft] def prunedBy(s: SparkSession, dir: String, v: Int,
      colName: String, lo: String, hi: String)
      : (DataFrame, Int, Int) = {
    val lines = Snapshots.manifestLines(dir, v)
    val kept = lines.map(ManifestEntry.parse).filter { e =>
      e.stats.get(colName) match {
        case Some(bounds) => ManifestEntry.boundsIntersect(bounds, lo, hi)
        // absence pruning is sound ONLY for the named dialect (it
        // enumerates every stat-able column); anything else keeps
        case None => !e.named
      }
    }.map(_.path)
    val df =
      if (kept.nonEmpty)
        s.read.option("mergeSchema", "true").parquet(kept: _*)
      else s.read.parquet(Snapshots.manifest(dir, v).head)
        .filter(lit(false))
    (df, kept.size, lines.size)
  }

  /** Lands the evolved-schema stats store once per source version:
    * v1 = nations 0–11 with (k, nkd, bal), named stats in manifest_1;
    * v2 = the evolution append — nations ≥ 12 joined with their order
    * counts, carrying the NEW column `ordc`, landed range-partitioned
    * on it (4 disjoint ordc ranges → per-file bounds are selective);
    * manifest_2 = v1 entries verbatim + the new files' entries.
    */
  private[graft] def s39Dir(s: SparkSession, d: String): String =
    graft.util.Landing.landedLayout(
      s"$d|custorders|${graft.util.Landing.sourceMtime(d,
        Seq("customer", "orders"))}|genstats",
      "graft_genstats") { dir =>
      val base = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nkd"),
          round(col("c_acctbal") * 100).cast("long").as("bal"))
      base.filter(col("nkd") < 12)
        .withColumn("nk", col("nkd"))
        .repartition(col("nk"))
        .write.mode("overwrite").partitionBy("nk").parquet(s"$dir/v1")
      val m1 = entries(s, Store.walkLeafFiles(dir, "v1"))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_1.txt"),
        m1.mkString("\n").getBytes("UTF-8"))
      val ordc = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("k"))
        .agg(count(lit(1)).as("ordc"))
      base.filter(col("nkd") >= 12).join(ordc, "k")
        .repartitionByRange(4, col("ordc"))
        .write.mode("overwrite").parquet(s"$dir/v2add")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/manifest_2.txt"),
        (m1 ++ entries(s, Store.walkLeafFiles(dir, "v2add")))
          .mkString("\n").getBytes("UTF-8"))
    }

  /** S39: the registered read — a selective range aggregate ON THE
    * EVOLVED COLUMN (`ordc`, which v1's files never carried), served by
    * the named-stats prune: every pre-evolution file is skipped by
    * column absence, post-evolution files by their range-partitioned
    * per-file bounds (gate: strict subset via `skipped_files`). The
    * oracle recomputes from raw customer+orders, so the hash gate fails
    * if pruning drops a matching row or a stats entry goes stale.
    */
  private def s39SchemaStatsPrune(s: SparkSession, d: String): DataFrame = {
    val dir = s39Dir(s, d)
    val (df, kept, total) = prunedBy(s, dir, 2, "ordc",
      BigDecimal(8), BigDecimal(12))
    df.filter(col("ordc").between(8, 12))
      .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("bal_cents"),
        sum(col("ordc")).as("sum_ordc"))
      .select(col("n_rows"), col("bal_cents"), col("sum_ordc"),
        lit(kept < total).as("skipped_files"),
        lit(kept > 0).as("read_some"))
  }

  private val s39Sql =
    """WITH oc AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS ordc
      |  FROM orders GROUP BY 1)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
      |    AS bal_cents,
      |  CAST(SUM(ordc) AS BIGINT) AS sum_ordc,
      |  TRUE AS skipped_files, TRUE AS read_some
      |FROM customer JOIN oc ON c_custkey = o_custkey
      |WHERE c_nationkey >= 12 AND ordc BETWEEN 8 AND 12""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "s39_schema_stats_prune" -> Q(s39SchemaStatsPrune, Some(s39Sql)),
  )
}
