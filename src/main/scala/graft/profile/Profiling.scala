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

  /** A3 (full): describe() over a MIXED frame — numeric columns get the
    * full stat row; string (and other non-numeric) columns get count-only
    * rows with null stats, matching the reference's whole-frame
    * `df.describe()` (stroke_predict.py:26, stroke_prediction.ipynb:70)
    * in the melted one-row-per-column shape. Still ONE aggregate pass.
    */
  def describeAll(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val isNum = cols.map(c =>
      c -> df.schema(c).dataType.isInstanceOf[NumericType]).toMap
    val aggExprs = cols.flatMap { c =>
      if (isNum(c))
        Seq(
          count(col(c)).as(s"__n_$c"),
          davg(col(c)).as(s"__mean_$c"),
          dstddev(col(c)).as(s"__std_$c"),
          min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
      else Seq(count(col(c)).as(s"__n_$c"))
    }
    val one = df.agg(aggExprs.head, aggExprs.tail: _*)
    val nullD = lit(null).cast("double")
    val structs = cols.map { c =>
      if (isNum(c))
        struct(
          lit(c).as("column"), col(s"__n_$c").as("n"),
          col(s"__mean_$c").as("mean"), col(s"__std_$c").as("stddev"),
          col(s"__min_$c").as("min"), col(s"__max_$c").as("max"))
      else
        struct(
          lit(c).as("column"), col(s"__n_$c").as("n"),
          nullD.as("mean"), nullD.as("stddev"),
          nullD.as("min"), nullD.as("max"))
    }
    one.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  private def a3bDescribeAll(s: SparkSession, d: String): DataFrame =
    describeAll(Tables.orders(s, d),
      Seq("o_totalprice", "o_orderstatus", "o_orderpriority"))
      .orderBy(col("column"))

  private val a3bSql = {
    val numeric =
      s"""SELECT 'o_totalprice' AS "column",
         |  CAST(COUNT(o_totalprice) AS BIGINT) AS n,
         |  ${sqlDavg("o_totalprice")} AS mean,
         |  ${sqlDstddev("o_totalprice")} AS stddev,
         |  CAST(MIN(o_totalprice) AS DOUBLE) AS min,
         |  CAST(MAX(o_totalprice) AS DOUBLE) AS max
         |FROM orders""".stripMargin
    val strings = Seq("o_orderstatus", "o_orderpriority").map(c =>
      s"""SELECT '$c', CAST(COUNT($c) AS BIGINT),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
         |FROM orders""".stripMargin)
    (numeric +: strings)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY \"column\"")
  }

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

  /** ML18 'auto' bins (reference matplotlib bins='auto',
    * stroke_predict.py:35-41): bin count from the data itself via the
    * Sturges rule, ceil(log2 n)+1 — chosen over matplotlib's
    * max(Sturges, Freedman–Diaconis) because every input (n, min, max) is
    * EXACT in both engines, so edges and counts are bit-reproducible
    * cross-engine (FD needs a percentile, whose interpolation is
    * engine-specific). Two scans: a tiny stats agg broadcast into the
    * binning pass — no collect, no driver loop. The top edge folds into
    * the last bin (matplotlib's closed last interval).
    */
  def histogramAuto(df: DataFrame, c: String): DataFrame = {
    val x = col(c).cast("double")
    val stats = df.agg(count(x).as("cnt"), min(x).as("lo"), max(x).as("hi"))
      .select(col("lo"), col("hi"),
        (ceil(log2(col("cnt"))) + lit(1)).cast("long").as("nbins"),
        ((col("hi") - col("lo")) /
          (ceil(log2(col("cnt"))) + lit(1)).cast("long")).as("width"))
    // hi == lo (constant column / one row) ⇒ width 0 ⇒ 0.0/0.0 = NaN,
    // whose long cast THROWS under ANSI — degenerate inputs take bin 0
    df.select(x.as("x")).crossJoin(broadcast(stats))
      .select(when(col("hi") === col("lo"), lit(0L))
        .otherwise(least(
          floor((col("x") - col("lo")) / col("width")).cast("long"),
          col("nbins") - 1)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  private def h2HistogramAuto(s: SparkSession, d: String): DataFrame =
    histogramAuto(Tables.orders(s, d), "o_totalprice")
      .orderBy(col("bin"))

  private val h2Sql =
    """WITH s AS (
      |  SELECT count(o_totalprice) AS cnt, min(o_totalprice) AS lo,
      |         max(o_totalprice) AS hi
      |  FROM orders),
      |b AS (
      |  SELECT lo, hi, CAST(ceil(log2(cnt)) + 1 AS BIGINT) AS nbins,
      |    (hi - lo) / CAST(ceil(log2(cnt)) + 1 AS BIGINT) AS width
      |  FROM s)
      |SELECT CAST(CASE WHEN hi = lo THEN 0
      |            ELSE least(CAST(floor((o_totalprice - lo) / width) AS BIGINT),
      |                       nbins - 1) END AS BIGINT) AS bin,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM orders, b GROUP BY 1 ORDER BY bin""".stripMargin

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
    * HLL sketch internals differ across engines, so the raw estimate
    * can't hash-match a DuckDB value; instead the query emits the EXACT
    * counts plus booleans asserting the estimates land within 3× the
    * configured rsd of them — the oracle then checks the exact counts
    * and expects the bounds to hold (TRUE), turning the former rows-only
    * row into a hard error-bound gate. (The exact count is affordable
    * here because it IS the oracle contract; production callers use the
    * estimate alone.)
    */
  private def a7ApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val rsd = 0.01
    Tables.lineitem(s, d)
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        approx_count_distinct(col("l_orderkey"), rsd).as("approx_orders"),
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"))
      .select(col("n_orders"), col("n_parts"),
        (abs(col("approx_orders") - col("n_orders")).cast("double") /
          col("n_orders") <= 3 * rsd).as("orders_within_bound"),
        (abs(col("approx_parts") - col("n_parts")).cast("double") /
          col("n_parts") <= 3 * rsd).as("parts_within_bound"))
  }

  private val a7Sql =
    """SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
      |       TRUE AS orders_within_bound,
      |       TRUE AS parts_within_bound
      |FROM lineitem""".stripMargin

  // ---- A10: sketch quantiles with an exact-bounded gate -------------------
  /** approx_percentile (GK/KLL-family sketch: bounded memory, mergeable
    * partials — the only quantile that works at 100 TB, where the exact
    * form needs a full sort per group) gated a7-style: the row carries
    * the EXACT percentile_disc values (t5-proven engine-neutral — actual
    * data values, no interpolation ulp) as the compared payload, plus
    * within-bound flags on the sketch estimates. The oracle recomputes
    * the exact values and expects TRUE flags, so a sketch drifting past
    * 1% of the exact value fails the row. (The exact aggregate exists
    * here because it IS the oracle contract; production callers use the
    * sketch alone.)
    */
  private def a10ApproxQuantiles(s: SparkSession, d: String): DataFrame = {
    val acc = 10000
    def exact(q: Double) = expr(
      s"percentile_disc($q) WITHIN GROUP (ORDER BY l_extendedprice)")
    def bound(ap: Column, ex: Column) = // same zero-guard shape as a11
      abs(ap - ex) <= greatest(abs(ex) * lit(0.01), lit(1e-9))
    Tables.lineitem(s, d)
      .agg(exact(0.25).as("_e25"), exact(0.5).as("_e50"),
        exact(0.75).as("_e75"),
        expr(s"approx_percentile(l_extendedprice, " +
          s"array(0.25D, 0.5D, 0.75D), $acc)").as("_ap"))
      .select(col("_e25").as("p25"), col("_e50").as("p50"),
        col("_e75").as("p75"),
        bound(element_at(col("_ap"), 1), col("_e25")).as("p25_within_bound"),
        bound(element_at(col("_ap"), 2), col("_e50")).as("p50_within_bound"),
        bound(element_at(col("_ap"), 3), col("_e75")).as("p75_within_bound"))
  }

  private val a10Sql =
    """SELECT
      |  PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
      |  PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
      |  PERCENTILE_DISC(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
      |  TRUE AS p25_within_bound,
      |  TRUE AS p50_within_bound,
      |  TRUE AS p75_within_bound
      |FROM lineitem""".stripMargin

  /** A11: GROUPED percentile report — the p50/p95/p99-per-dimension
    * dashboard query, a10's gate shape taken per group. The exact side
    * is `percentile_disc` (picks actual data values — engine-identical
    * by construction, the a10 discipline) and exists as the oracle
    * contract; the production path at 100 TB is the SKETCH column
    * (`approx_percentile`, bounded memory per group where the exact
    * aggregate must buffer the group), which the per-group within-1%
    * flags hold to the exact values. Cost: one scan, one exchange of
    * |groups| aggregation states with map-side partial sketches.
    */
  private def a11GroupQuantiles(s: SparkSession, d: String): DataFrame = {
    val acc = 10000
    def exact(q: Double) = expr(
      s"percentile_disc($q) WITHIN GROUP (ORDER BY value)")
    // Relative bound with an absolute-epsilon floor: if a regen ever
    // makes a group's exact percentile 0, `/abs(ex)` would turn the flag
    // NaN/false and fail the oracle with an opaque hash mismatch; the
    // greatest() floor keeps the gate loud but legible (round-12 advice).
    def bound(ap: Column, ex: Column) =
      abs(ap - ex) <= greatest(abs(ex) * lit(0.01), lit(1e-9))
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        exact(0.5).as("_e50"), exact(0.95).as("_e95"),
        exact(0.99).as("_e99"),
        expr(s"approx_percentile(value, array(0.5D, 0.95D, 0.99D), $acc)")
          .as("_ap"))
      .select(col("event_type"), col("n"),
        col("_e50").as("p50"), col("_e95").as("p95"), col("_e99").as("p99"),
        bound(element_at(col("_ap"), 1), col("_e50")).as("p50_within_bound"),
        bound(element_at(col("_ap"), 2), col("_e95")).as("p95_within_bound"),
        bound(element_at(col("_ap"), 3), col("_e99")).as("p99_within_bound"))
      .orderBy(col("event_type"))
  }

  private val a11Sql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  PERCENTILE_DISC(0.5)  WITHIN GROUP (ORDER BY value) AS p50,
      |  PERCENTILE_DISC(0.95) WITHIN GROUP (ORDER BY value) AS p95,
      |  PERCENTILE_DISC(0.99) WITHIN GROUP (ORDER BY value) AS p99,
      |  TRUE AS p50_within_bound, TRUE AS p95_within_bound,
      |  TRUE AS p99_within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---- A12: correlation matrix ---------------------------------------------
  /** A12: pairwise Pearson correlations over lineitem's numeric columns —
    * the pandas `df.corr()` panel a profiling pass emits next to
    * describe(). All moment sums are EXACT decimals (the Det discipline:
    * a correlation whose value depends on shuffle order is a bug, not
    * noise); the final ratio is assembled in ONE fixed double-op order
    * both engines repeat — num = n·Σxy − Σx·Σy, den = √(n·Σx²−Σx²ᵗᵒᵗ) ·
    * √(n·Σy²−Σy²ᵗᵒᵗ) — and rounded to 6 dp (the dstddev rule: decimal
    * sums past 2^53 round on the double cast, engines may differ in the
    * last ulp).
    *
    * Scale: ONE scan, one 10-sum aggregate with map-side partials, one
    * 1-row result — the cheapest possible full-corpus statistic.
    */
  private def a12Correlations(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val q  = col("l_quantity").cast(DecimalType(14, 2))
    val p  = col("l_extendedprice").cast(DecimalType(14, 2))
    val dc = col("l_discount").cast(DecimalType(4, 2))
    def dbl(c: Column) = sum(c).cast("double")
    def corr(n: Column, sx: Column, sy: Column, sxy: Column,
        sxx: Column, syy: Column) =
      round((n * sxy - sx * sy) /
        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
    Tables.lineitem(s, d)
      .agg(count(lit(1)).cast("double").as("_n"),
        dbl(q).as("_sq"), dbl(p).as("_sp"), dbl(dc).as("_sd"),
        dbl(q * q).as("_sqq"), dbl(p * p).as("_spp"), dbl(dc * dc).as("_sdd"),
        dbl(q * p).as("_sqp"), dbl(q * dc).as("_sqd"), dbl(p * dc).as("_spd"))
      .select(col("_n").cast("long").as("n"),
        corr(col("_n"), col("_sq"), col("_sp"), col("_sqp"), col("_sqq"),
          col("_spp")).as("qty_price_corr"),
        corr(col("_n"), col("_sq"), col("_sd"), col("_sqd"), col("_sqq"),
          col("_sdd")).as("qty_disc_corr"),
        corr(col("_n"), col("_sp"), col("_sd"), col("_spd"), col("_spp"),
          col("_sdd")).as("price_disc_corr"))
  }

  private val a12Sql = {
    def dsum(e: String) = s"CAST(SUM($e) AS DOUBLE)"
    val q = "CAST(l_quantity AS DECIMAL(14,2))"
    val p = "CAST(l_extendedprice AS DECIMAL(14,2))"
    val dc = "CAST(l_discount AS DECIMAL(4,2))"
    def corr(sx: String, sy: String, sxy: String, sxx: String, syy: String) =
      s"ROUND((n * $sxy - $sx * $sy) / " +
        s"(SQRT(n * $sxx - $sx * $sx) * SQRT(n * $syy - $sy * $sy)), 6)"
    s"""WITH m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${dsum(q)} AS sq, ${dsum(p)} AS sp, ${dsum(dc)} AS sd,
       |    ${dsum(s"$q * $q")} AS sqq, ${dsum(s"$p * $p")} AS spp,
       |    ${dsum(s"$dc * $dc")} AS sdd,
       |    ${dsum(s"$q * $p")} AS sqp, ${dsum(s"$q * $dc")} AS sqd,
       |    ${dsum(s"$p * $dc")} AS spd
       |  FROM lineitem)
       |SELECT CAST(n AS BIGINT) AS n,
       |  ${corr("sq", "sp", "sqp", "sqq", "spp")} AS qty_price_corr,
       |  ${corr("sq", "sd", "sqd", "sqq", "sdd")} AS qty_disc_corr,
       |  ${corr("sp", "sd", "spd", "spp", "sdd")} AS price_disc_corr
       |FROM m""".stripMargin
  }

  val qs: Seq[(String, Q)] = Seq(
    "a12_correlations"   -> Q(a12Correlations, Some(a12Sql)),
    "a3_describe"        -> Q(a3Describe, Some(a3Sql)),
    "a10_approx_quantiles" -> Q(a10ApproxQuantiles, Some(a10Sql)),
    "a11_group_quantiles" -> Q(a11GroupQuantiles, Some(a11Sql)),
    "a3b_describe_all"   -> Q(a3bDescribeAll, Some(a3bSql)),
    "a4_null_profile"    -> Q(a4NullProfile, Some(a4Sql)),
    "a1_category_freq"   -> Q(a1CategoryFreq, Some(a1fSql)),
    "h1_histogram"       -> Q(h1Histogram, Some(h1Sql)),
    "h2_histogram_auto"  -> Q(h2HistogramAuto, Some(h2Sql)),
    "a7_approx_distinct" -> Q(a7ApproxDistinct, Some(a7Sql)),
  )
}
