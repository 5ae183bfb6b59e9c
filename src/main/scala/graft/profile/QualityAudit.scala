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

  val qs: Seq[(String, Q)] = Seq(
    "dq1_constraint_audit" -> Q(dq1Audit, Some(dq1Sql)),
  )
}
