package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Det._

/** Set operations, outer joins, correlated-subquery patterns, and date
  * extraction — the remaining ANSI surface a warehouse user expects
  * (SURVEY.md §2.4 extensions).
  */
object SetAndSubqueryOps {

  // ---- U2: INTERSECT / EXCEPT (distinct set semantics) -------------------
  private def u2IntersectExcept(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val hi = c.filter(col("c_acctbal") > 5000).select(col("c_mktsegment"))
    val auto = c.filter(col("c_mktsegment").startsWith("A")).select(col("c_mktsegment"))
    val both = hi.intersect(auto).select(col("c_mktsegment"), lit("both").as("src"))
    val only = hi.except(auto).select(col("c_mktsegment"), lit("hi_only").as("src"))
    both.union(only).orderBy(col("c_mktsegment"), col("src"))
  }

  private val u2Sql =
    """SELECT * FROM (
      |  SELECT c_mktsegment, 'both' AS src FROM (
      |    SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
      |    INTERSECT
      |    SELECT c_mktsegment FROM customer WHERE c_mktsegment LIKE 'A%')
      |  UNION ALL
      |  SELECT c_mktsegment, 'hi_only' AS src FROM (
      |    SELECT c_mktsegment FROM customer WHERE c_acctbal > 5000
      |    EXCEPT
      |    SELECT c_mktsegment FROM customer WHERE c_mktsegment LIKE 'A%')
      |) ORDER BY c_mktsegment, src""".stripMargin

  // ---- U3: INTERSECT ALL / EXCEPT ALL (bag semantics) ---------------------
  /** U3: the multiplicity-preserving set ops u2's distinct forms erase —
    * ANSI bag semantics: EXCEPT ALL keeps max(mᴬ−mᴮ, 0) copies of each
    * value, INTERSECT ALL min(mᴬ, mᴮ). The inputs are supplier-key bags
    * from the two order-parity halves of lineitem (every key appears
    * many times — multiplicities, not membership, are what's under
    * test). Emitted aggregated to (suppkey, n) so the full multiplicity
    * vector hash-checks.
    *
    * Scale: Catalyst rewrites both ops to a grouped multiplicity
    * aggregate + generate — one shuffle per side keyed by the value,
    * map-side partials; never a sort or a nested loop.
    */
  private def u3BagOps(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val a = li.filter(col("l_orderkey") % 2 === 0).select(col("l_suppkey"))
    val b = li.filter(col("l_orderkey") % 2 === 1).select(col("l_suppkey"))
    def agg(df: DataFrame, src: String) =
      df.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
        .select(col("l_suppkey"), lit(src).as("op"), col("n"))
    agg(a.exceptAll(b), "except_all")
      .unionByName(agg(a.intersectAll(b), "intersect_all"))
      .orderBy(col("op"), col("l_suppkey"))
  }

  private val u3Sql =
    """SELECT l_suppkey, op, CAST(COUNT(*) AS BIGINT) AS n FROM (
      |  SELECT l_suppkey, 'except_all' AS op FROM (
      |    SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 0
      |    EXCEPT ALL
      |    SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 1)
      |  UNION ALL
      |  SELECT l_suppkey, 'intersect_all' FROM (
      |    SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 0
      |    INTERSECT ALL
      |    SELECT l_suppkey FROM lineitem WHERE l_orderkey % 2 = 1))
      |GROUP BY l_suppkey, op
      |ORDER BY op, l_suppkey""".stripMargin

  // ---- J4: full outer join (keep customers without orders and vice versa)
  private def j4FullOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val o = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        coalesce(col("c_mktsegment"), lit("?")).as("segment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend"), lit(0.0)).as("spend"))
      .orderBy(col("custkey"))
  }

  private val j4Sql =
    s"""SELECT COALESCE(c_custkey, o_custkey) AS custkey,
       |       COALESCE(c_mktsegment, '?') AS segment,
       |       COALESCE(n_orders, 0) AS n_orders,
       |       COALESCE(spend, 0.0) AS spend
       |FROM customer
       |FULL OUTER JOIN (
       |  SELECT o_custkey, COUNT(*) AS n_orders,
       |         ${sqlDsum("o_totalprice")} AS spend
       |  FROM orders GROUP BY o_custkey
       |) ON c_custkey = o_custkey
       |ORDER BY custkey""".stripMargin

  // ---- Q17-style: correlated aggregate (small-quantity revenue) ----------
  // Decorrelated form: join against the per-part average — the plan shape
  // Catalyst produces for the correlated subquery, written directly.
  private def q17SmallQty(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val avgQty = l.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    l.join(avgQty, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg(dsum(col("l_extendedprice")).as("small_qty_revenue"),
        count(lit(1)).as("n_items"))
  }

  private val q17Sql =
    s"""SELECT ${sqlDsum("l_extendedprice")} AS small_qty_revenue,
       |       COUNT(*) AS n_items
       |FROM lineitem l
       |JOIN (SELECT l_partkey AS p_key,
       |             SUM(l_quantity) / COUNT(*) AS avg_qty
       |      FROM lineitem GROUP BY l_partkey) a
       |  ON l.l_partkey = a.p_key
       |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin

  // ---- D5: date-part extraction + grouping -------------------------------
  private def d5DateParts(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("y"), col("m"))

  private val d5Sql =
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS y,
       |       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS m,
       |       COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS revenue
       |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin

  // ---- D6: date/time-function battery ------------------------------------
  // Functions with unambiguous cross-engine semantics (day-of-week
  // numbering intentionally avoided — Spark counts from Sunday=1, DuckDB
  // from Sunday=0).
  // Dates are emitted as ISO strings: Spark DATE reads back as
  // datetime.date while DuckDB's arrives as datetime64 — identical values,
  // different pandas dtypes, which a hash comparator may distinguish.
  private def d6DateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd")
          .as("due"),
        datediff(lit("2002-01-01").cast("date"), to_date(col("o_orderdate")))
          .cast("long").as("age_days"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"))
      .orderBy(col("o_orderkey"))

  private val d6Sql =
    """SELECT o_orderkey,
      |  STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od,
      |  CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dom,
      |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS q,
      |  STRFTIME(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due,
      |  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS age_days,
      |  STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "u2_intersect_except" -> Q(u2IntersectExcept, Some(u2Sql)),
    "u3_bag_ops"          -> Q(u3BagOps, Some(u3Sql)),
    "d6_date_funcs"       -> Q(d6DateFuncs, Some(d6Sql)),
    "j4_full_outer"       -> Q(j4FullOuter, Some(j4Sql)),
    "q17_small_qty_rev"   -> Q(q17SmallQty, Some(q17Sql)),
    "d5_date_parts"       -> Q(d5DateParts, Some(d5Sql)),
  )
}
