package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic float aggregation helpers.
  *
  * Summing IEEE doubles is order-dependent, and Spark's shuffle order is
  * nondeterministic — so a plain `sum(double)` can differ between runs and
  * between engines (the DuckDB oracle sums in a different order). The
  * testdata money columns are 2-decimal values stored as doubles, so we
  * route sums through exact decimal arithmetic and cast the final result
  * back to double: both engines then produce bit-identical results.
  *
  * This is also the right call at 100 TB: a monetary aggregate whose value
  * depends on partitioning is a correctness bug, not a rounding detail.
  */
object Det {
  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum(c: Column, prec: Int = 14, scale: Int = 2): Column =
    sum(c.cast(DecimalType(prec, scale))).cast("double")

  /** Deterministic mean of a 2-decimal money column. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact revenue term: price * (1 - discount), in decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(DecimalType(14, 2)) *
      (lit(1).cast(DecimalType(4, 2)) - discount.cast(DecimalType(4, 2)))

  /** Exact sum of price*(1-discount), as double. */
  def revenueSum(price: Column, discount: Column): Column =
    sum(revenueTerm(price, discount)).cast("double")

  /** Sample standard deviation via exact decimal sums:
    * sqrt((sum(x^2) - sum(x)^2/n) / (n-1)). The decimal sums are exact,
    * but once sum(x²) exceeds 2^53 (≈600k rows of squared prices) its
    * decimal→double cast rounds, and engines may round the last ulp
    * differently — so the result is rounded to 6 decimals, far above the
    * ulp noise and far below any statistical meaning.
    */
  def dstddev(c: Column, prec: Int = 14, scale: Int = 2): Column = {
    val d     = c.cast(DecimalType(prec, scale))
    val n     = count(lit(1)).cast("double")
    val s     = sum(d).cast("double")
    val sq    = sum(d * d).cast("double")
    round(sqrt((sq - s * s / n) / (n - lit(1.0))), 6)
  }

  /** Matching DuckDB SQL fragments (kept beside the Scala so the two sides
    * can't drift): see CoreOps oracle strings.
    */
  def sqlDsum(col: String, prec: Int = 14, scale: Int = 2): String =
    s"CAST(SUM(CAST($col AS DECIMAL($prec,$scale))) AS DOUBLE)"

  def sqlDavg(col: String): String =
    s"(${sqlDsum(col)} / COUNT(*))"

  def sqlRevenueSum(price: String, discount: String): String =
    s"CAST(SUM(CAST($price AS DECIMAL(14,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST($discount AS DECIMAL(4,2)))) AS DOUBLE)"

  def sqlDstddev(col: String, prec: Int = 14, scale: Int = 2): String = {
    val s  = s"CAST(SUM(CAST($col AS DECIMAL($prec,$scale))) AS DOUBLE)"
    val sq = s"CAST(SUM(CAST($col AS DECIMAL($prec,$scale)) * CAST($col AS DECIMAL($prec,$scale))) AS DOUBLE)"
    s"ROUND(SQRT(($sq - $s * $s / CAST(COUNT(*) AS DOUBLE)) / (CAST(COUNT(*) AS DOUBLE) - 1.0)), 6)"
  }
}
