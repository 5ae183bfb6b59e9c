package graft.profile

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Det._

/** Data-profiling operators (SURVEY.md §2.3: A3 describe, A4 null profile,
  * ML18 histogram). All single-pass multi-aggregates: one scan, partial
  * aggregation map-side, tiny result — the shape that scales to 100 TB
  * (never collect, never per-column jobs).
  */
object Profiling {

  /** A3: describe() equivalent — count/mean/stddev/min/max for numeric
    * columns, computed with deterministic decimal sums (Det.dstddev), one
    * row per source column ("melted" so adding columns doesn't change the
    * schema).
    */
  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    // ONE aggregate over all columns (single scan, partial agg map-side),
    // then melt the single row into per-column rows. A union of per-column
    // aggregates would scan the table once per column — wrong at 100 TB.
    val aggExprs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__n_$c"),
        davg(col(c)).as(s"__mean_$c"),
        dstddev(col(c)).as(s"__std_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__mean_$c").as("mean"), col(s"__std_$c").as("stddev"),
        col(s"__min_$c").as("min"), col(s"__max_$c").as("max"))
    }
    one.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  private def a3Describe(s: SparkSession, d: String): DataFrame =
    describeNumeric(Tables.lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount"))
      .orderBy(col("column"))

  private def a3DescribeCol(c: String): String =
    s"""SELECT '$c' AS "column", CAST(COUNT($c) AS BIGINT) AS n,
       |  ${sqlDavg(c)} AS mean,
       |  ${sqlDstddev(c)} AS stddev,
       |  CAST(MIN($c) AS DOUBLE) AS min, CAST(MAX($c) AS DOUBLE) AS max
       |FROM lineitem""".stripMargin

  private val a3Sql =
    Seq("l_quantity", "l_extendedprice", "l_discount")
      .map(a3DescribeCol).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")

  /** A4: single-pass null-count profile (stroke_prediction.ipynb:99-103):
    * sum(isNull cast int) for every column, one row out.
    */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      sum(col(c).isNull.cast("long")).as(c)): _*)

  private def a4NullProfile(s: SparkSession, d: String): DataFrame =
    nullProfile(Tables.orders(s, d))

  private val a4Sql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map(c =>
      s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS $c")
      .mkString("SELECT ", ", ", " FROM orders")
  }

  /** ML18: numeric histogram as a distributed aggregate — fixed-width bins
    * via floor((x - lo) / width), groupBy bin. Matplotlib rendering is out
    * of scope (SURVEY §2.6 ML18); the aggregate is the data product.
    */
  def histogram(df: DataFrame, c: String, lo: Double, width: Double): DataFrame =
    df.select(floor((col(c) - lit(lo)) / lit(width)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))

  private def h1Histogram(s: SparkSession, d: String): DataFrame =
    histogram(Tables.orders(s, d), "o_totalprice", 0.0, 50000.0)
      .orderBy(col("bin"))

  private val h1Sql =
    """SELECT CAST(FLOOR((o_totalprice - 0.0) / 50000.0) AS BIGINT) AS bin,
      |       COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin

  /** A1 variant: per-category frequency table over a categorical column
    * (stroke_predict.py:29-30 class histogram shape).
    */
  private def a1CategoryFreq(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))

  private val a1fSql =
    """SELECT event_type, COUNT(*) AS n,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Approximate distinct (HLL) — the 100 TB path for cardinality stats.
    * No SQL oracle (sketch internals differ across engines); spec-tested
    * against exact distinct at small SF.
    */
  private def a7ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))

  val qs: Seq[(String, Q)] = Seq(
    "a3_describe"        -> Q(a3Describe, Some(a3Sql)),
    "a4_null_profile"    -> Q(a4NullProfile, Some(a4Sql)),
    "a1_category_freq"   -> Q(a1CategoryFreq, Some(a1fSql)),
    "h1_histogram"       -> Q(h1Histogram, Some(h1Sql)),
    "a7_approx_distinct" -> Q(a7ApproxDistinct, None),
  )
}
