package graft.profile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Data-quality constraint audit (dq1): the dbt-test / Deequ-style
  * contract check every warehouse load runs before publishing a
  * partition — primary-key uniqueness, referential integrity, null and
  * domain constraints — emitted as one (check, violation_count) report
  * so a scheduler can gate the load on `max(violations) == 0`.
  *
  * Each check is a scan + aggregate or an anti-join:
  *  - PK uniqueness: groupBy count — one shuffle on the key, partials
  *    map-side; at 10^11 rows this is the a1 shape.
  *  - FK orphans: LEFT ANTI join fact→parent on the key — the parent
  *    side broadcasts when small, otherwise shuffles on the same key the
  *    fact is typically already bucketed by (j6's layout makes this
  *    exchange-free).
  *  - Null/domain checks: map-only conditional counts folded into ONE
  *    scan per table (a single aggregate computes all of a table's
  *    row-local checks — never one pass per rule).
  * The per-check one-row results union into the report; the union is
  * driver-free (no collect).
  */
object QualityAudit {

  private def dq1Audit(s: SparkSession, d: String): DataFrame =
    audit(Tables.orders(s, d), Tables.lineitem(s, d), Tables.customer(s, d))

  /** The audit over arbitrary frames with the TPC-H column names —
    * exposed so specs can plant violations and assert per-check counts.
    */
  def audit(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame): DataFrame = {
    val pkDup = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(coalesce(sum(col("c")), lit(0L)).as("violations"))
      .select(lit("orders_pk_duplicates").as("check_name"), col("violations"))

    val fkOrphanLine = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_fk_orphans").as("check_name"), col("violations"))

    val fkOrphanOrder = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_fk_orphans").as("check_name"), col("violations"))

    // all row-local lineitem rules in ONE scan
    val rowLocal = lineitem.agg(
        count(when(col("l_quantity").isNull || col("l_quantity") < 1 ||
          col("l_quantity") > 50, 1)).as("qty_range"),
        count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
          .as("discount_range"),
        count(when(col("l_extendedprice") <= 0, 1)).as("price_positive"))
    val rowChecks = rowLocal.select(
        explode(map(
          lit("lineitem_quantity_range"), col("qty_range"),
          lit("lineitem_discount_range"), col("discount_range"),
          lit("lineitem_price_positive"), col("price_positive")))
          .as(Seq("check_name", "violations")))

    pkDup.unionByName(fkOrphanLine).unionByName(fkOrphanOrder)
      .unionByName(rowChecks)
      .orderBy(col("check_name"))
  }

  private val dq1Sql =
    """SELECT check_name, violations FROM (
      |  SELECT 'orders_pk_duplicates' AS check_name,
      |    CAST(COALESCE((SELECT SUM(c) FROM (
      |      SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
      |      HAVING COUNT(*) > 1)), 0) AS BIGINT) AS violations
      |  UNION ALL
      |  SELECT 'lineitem_fk_orphans',
      |    CAST((SELECT COUNT(*) FROM lineitem
      |      WHERE NOT EXISTS (SELECT 1 FROM orders
      |        WHERE o_orderkey = l_orderkey)) AS BIGINT)
      |  UNION ALL
      |  SELECT 'orders_fk_orphans',
      |    CAST((SELECT COUNT(*) FROM orders
      |      WHERE NOT EXISTS (SELECT 1 FROM customer
      |        WHERE c_custkey = o_custkey)) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem_quantity_range',
      |    CAST((SELECT COUNT(*) FILTER (WHERE l_quantity IS NULL
      |      OR l_quantity < 1 OR l_quantity > 50) FROM lineitem) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem_discount_range',
      |    CAST((SELECT COUNT(*) FILTER (WHERE l_discount < 0
      |      OR l_discount > 1) FROM lineitem) AS BIGINT)
      |  UNION ALL
      |  SELECT 'lineitem_price_positive',
      |    CAST((SELECT COUNT(*) FILTER (WHERE l_extendedprice <= 0)
      |      FROM lineitem) AS BIGINT))
      |ORDER BY check_name""".stripMargin

  // ---- DQ2: table reconciliation diff ------------------------------------
  /** Two-table reconciliation (the data-migration / backfill audit):
    * full-outer join today's load against yesterday's on the primary
    * key, classify every key as added / removed / changed by
    * column-wise comparison, and report only the differences. The
    * "yesterday" side is derived deterministically from the same
    * parquet by modulo rules (keys ≡ 0 mod 101 dropped, prices bumped
    * +1.00 at keys ≡ 0 mod 97), so both engines reconstruct the
    * identical B table — the diff itself, not the mutation, is the
    * operator under test.
    *
    * Column comparison is value-equality on the typed columns, never a
    * stringified row hash: double→string formatting is engine-specific
    * (CLAUDE.md DATE/decimal bridge rules), while `a.price <> b.price`
    * on identically-derived IEEE doubles is exact in both engines.
    *
    * Scale: one full-outer hash join co-partitioned on the PK (with
    * j6's bucketed landing it is exchange-free); the classify/filter is
    * map-side, so the output is |diff| rows, not |table|. At 10^11 rows
    * this is the standard reconciliation plan — no driver state, no
    * collect.
    */
  private def dq2TableDiff(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val a = orders.select(col("o_orderkey").as("ka"),
      col("o_totalprice").as("pa"), col("o_orderstatus").as("sa"))
    val b = orders.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey").as("kb"),
        when(col("o_orderkey") % 97 === 0, col("o_totalprice") + 1.0d)
          .otherwise(col("o_totalprice")).as("pb"),
        col("o_orderstatus").as("sb"))
    a.join(b, col("ka") === col("kb"), "full_outer")
      .withColumn("diff_type",
        when(col("kb").isNull, lit("removed"))
          .when(col("ka").isNull, lit("added"))
          .when(col("pa") =!= col("pb") || col("sa") =!= col("sb"),
            lit("changed"))
          .otherwise(lit("same")))
      .filter(col("diff_type") =!= "same")
      .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
        col("diff_type"))
      .orderBy(col("o_orderkey"))
  }

  private val dq2Sql =
    """WITH b AS (
      |  SELECT o_orderkey AS kb,
      |    CASE WHEN o_orderkey % 97 = 0
      |      THEN o_totalprice + CAST(1.0 AS DOUBLE)
      |      ELSE o_totalprice END AS pb,
      |    o_orderstatus AS sb
      |  FROM orders WHERE o_orderkey % 101 <> 0)
      |SELECT COALESCE(o_orderkey, kb) AS o_orderkey, diff_type FROM (
      |  SELECT a.o_orderkey, kb,
      |    CASE WHEN kb IS NULL THEN 'removed'
      |         WHEN a.o_orderkey IS NULL THEN 'added'
      |         WHEN a.o_totalprice <> pb OR a.o_orderstatus <> sb
      |           THEN 'changed'
      |         ELSE 'same' END AS diff_type
      |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = kb) AS d
      |WHERE diff_type <> 'same'
      |ORDER BY o_orderkey""".stripMargin

  // ---- DQ3: distribution drift (PSI) -------------------------------------
  /** Population-stability-index drift check between two cohorts of the
    * same table (the pre-deploy gate every feature pipeline runs): here
    * the even/odd order-key halves, bucketed by fixed-width price bands.
    * Emits per-bucket cohort counts (exact integers — the hash anchor)
    * plus the bucket's PSI contribution (p_a − p_b)·ln(p_a / p_b).
    *
    * Portability: the bucket id is floor(price / width) of the identical
    * IEEE double in both engines (CLAUDE.md integer-div parity note);
    * proportions are divisions of identical longs (same IEEE result);
    * only ln() is libm-dependent (≤ 1 ulp), absorbed by round-6. Buckets
    * where either cohort is empty contribute NULL (ln undefined), never
    * an error.
    *
    * Scale: ONE scan — bucket id and cohort flag are map-side, then a
    * single groupBy(bucket) with conditional counts; the totals frame is
    * one broadcast row. At 10^11 rows this is the a1 aggregate shape.
    */
  private def dq3PsiDrift(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("bucket", floor(col("o_totalprice") / 20000.0d)
        .cast("int"))
      .withColumn("side", pmod(col("o_orderkey"), lit(2)))
    val grp = o.groupBy(col("bucket")).agg(
      count(when(col("side") === 0, 1)).as("cnt_a"),
      count(when(col("side") === 1, 1)).as("cnt_b"))
    val tot = grp.agg(sum(col("cnt_a")).as("na"), sum(col("cnt_b")).as("nb"))
    grp.crossJoin(broadcast(tot))
      .withColumn("pa", col("cnt_a").cast("double") / col("na"))
      .withColumn("pb", col("cnt_b").cast("double") / col("nb"))
      .select(col("bucket"), col("cnt_a"), col("cnt_b"),
        when(col("cnt_a") > 0 && col("cnt_b") > 0,
          round((col("pa") - col("pb")) * log(col("pa") / col("pb")), 6))
          .as("psi_contrib"))
      .orderBy(col("bucket"))
  }

  private val dq3Sql =
    """WITH grp AS (
      |  SELECT CAST(FLOOR(o_totalprice / CAST(20000.0 AS DOUBLE)) AS INT)
      |      AS bucket,
      |    COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS cnt_a,
      |    COUNT(*) FILTER (WHERE o_orderkey % 2 = 1) AS cnt_b
      |  FROM orders GROUP BY 1),
      |tot AS (SELECT SUM(cnt_a) AS na, SUM(cnt_b) AS nb FROM grp)
      |SELECT bucket, CAST(cnt_a AS BIGINT) AS cnt_a,
      |  CAST(cnt_b AS BIGINT) AS cnt_b,
      |  CASE WHEN cnt_a > 0 AND cnt_b > 0 THEN
      |    ROUND((CAST(cnt_a AS DOUBLE)/na - CAST(cnt_b AS DOUBLE)/nb)
      |      * LN((CAST(cnt_a AS DOUBLE)/na) / (CAST(cnt_b AS DOUBLE)/nb)),
      |      6)
      |  END AS psi_contrib
      |FROM grp, tot
      |ORDER BY bucket""".stripMargin

  // ---- DQ5: ingest-volume anomaly scan ------------------------------------
  /** Robust daily-volume monitoring — the pipeline-ops complement of
    * dq3's distribution drift: a scraper outage or a duplicate-ingest
    * incident shows up as a daily row count far from the corpus's norm
    * long before any content statistic moves. Median/MAD (not mean/σ)
    * so the detector doesn't let the anomaly inflate its own threshold
    * (od1's 3σ is the non-robust form). Exact medians: Spark's
    * `percentile` and DuckDB's `quantile_cont` share the p·(n−1) linear
    * interpolation, and over integer counts the interpolated values are
    * exact binary halves — identical doubles cross-engine, no rounding
    * needed before the comparison. Cost: one count-by-day scan (map-side
    * partials, |days| rows out) + two |days|-row scalar aggregates —
    * at 100 TB the daily counts would come from partition metadata or
    * mv1's landed rollup instead of a raw scan; the detector itself is
    * O(|days|) driver-trivial either way.
    */
  /** Median/MAD anomaly flags over a (day, n) frame — exposed for the
    * planted-anomaly spec.
    */
  private[graft] def volumeAnomaly(daily: DataFrame): DataFrame = {
    val med = daily.agg(expr("percentile(n, 0.5)").as("med"))
    val withMed = daily.crossJoin(broadcast(med))
    val mad = withMed
      .agg(expr("percentile(abs(n - med), 0.5)").as("mad"))
    withMed.crossJoin(broadcast(mad))
      .select(col("day"), col("n"),
        abs(col("n") - col("med")).as("dev"),
        (abs(col("n") - col("med")) > lit(3.0) * col("mad"))
          .as("is_anomaly"))
      .orderBy(col("day"))
  }

  private def dq5VolumeAnomaly(s: SparkSession, d: String): DataFrame =
    volumeAnomaly(Tables.events(s, d)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n")))

  private val dq5Sql =
    """WITH daily AS (
      |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |         CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |m AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
      |md AS (SELECT quantile_cont(abs(n - med), 0.5) AS mad
      |       FROM daily, m)
      |SELECT day, n, abs(n - med) AS dev,
      |       (abs(n - med) > 3.0 * mad) AS is_anomaly
      |FROM daily, m, md ORDER BY day""".stripMargin

  // ---- DQ6: per-stream freshness audit --------------------------------------
  /** The staleness fold over a (stream, last timestamp) frame — exposed
    * for the planted-stale-stream spec. Lag is measured against the
    * freshest stream's watermark (exact integer seconds — the af1
    * µs-div discipline), the production convention when no external
    * clock is trustworthy at audit time.
    */
  private[graft] def freshness(lastSeen: DataFrame,
      staleAfterS: Long): DataFrame = {
    val wm = lastSeen.agg(max(col("last_us")).as("wm_us"))
    lastSeen.crossJoin(broadcast(wm))
      .select(col("stream"), col("n"),
        expr("(wm_us - last_us) div 1000000").as("lag_s"))
      .select(col("stream"), col("n"), col("lag_s"),
        (col("lag_s") <= staleAfterS).as("fresh"))
      .orderBy(col("stream"))
  }

  /** DQ6: per-stream FRESHNESS — the remaining pillar of the dq family
    * (dq1 validity, dq2 content diff, dq3 distribution drift, dq4
    * embedding drift, dq5 volume): a dead upstream producer shows up as
    * one event_type's last-seen timestamp falling behind the others'
    * long before volume statistics move (the per-day granularity dq5
    * watches). Emits per stream the exact last-seen lag in integer
    * seconds behind the corpus watermark plus a freshness flag at a
    * 24 h SLO. At 100 TB last-seen-per-stream comes from partition
    * metadata or the streaming engine's commit log — the audit itself
    * is |streams|-sized either way; here it is one max-by-type scan
    * with map-side partials.
    */
  private def dq6Freshness(s: SparkSession, d: String): DataFrame =
    freshness(Tables.events(s, d)
      .groupBy(col("event_type").as("stream"))
      .agg(count(lit(1)).as("n"),
        max(unix_micros(col("ts"))).as("last_us")),
      staleAfterS = 24L * 3600L)

  private val dq6Sql =
    """WITH ls AS (
      |  SELECT event_type AS stream, CAST(COUNT(*) AS BIGINT) AS n,
      |         MAX(EPOCH_US(ts)) AS last_us
      |  FROM events GROUP BY 1),
      |wm AS (SELECT MAX(last_us) AS wm_us FROM ls)
      |SELECT stream, n,
      |  CAST((wm_us - last_us) // 1000000 AS BIGINT) AS lag_s,
      |  ((wm_us - last_us) // 1000000 <= 86400) AS fresh
      |FROM ls, wm ORDER BY stream""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "dq1_constraint_audit" -> Q(dq1Audit, Some(dq1Sql)),
    "dq6_freshness"        -> Q(dq6Freshness, Some(dq6Sql)),
    "dq2_table_diff"       -> Q(dq2TableDiff, Some(dq2Sql)),
    "dq3_psi_drift"        -> Q(dq3PsiDrift, Some(dq3Sql)),
    "dq5_volume_anomaly"   -> Q(dq5VolumeAnomaly, Some(dq5Sql)),
  )
}
