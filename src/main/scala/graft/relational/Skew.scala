package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.util.Det._

/** Skew mitigation: salted joins.
  *
  * When one join key carries a disproportionate share of rows, the
  * shuffle partition holding it becomes the straggler that defines job
  * latency at 1000 executors. Salting splits each hot key into `salt`
  * sub-keys: the big side gets a pseudo-random salt per row, the small
  * side is replicated across all salts. Identical results, `salt`×
  * smaller worst-case partition. (AQE's skew-join handles many cases at
  * runtime; explicit salting is the deterministic fallback, and the only
  * option when the skewed side feeds a window/aggregate rather than a
  * join.)
  */
object Skew {

  /** Join `big` to `small` on `key`, salting with `salt` sub-keys. The
    * big side's salt derives from hashing `rowSaltCols` (any columns that
    * vary within a key group); results are identical to the unsalted
    * join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowSaltCols: Seq[String], salt: Int): DataFrame = {
    val b = big.withColumn("_salt",
      pmod(xxhash64(rowSaltCols.map(col): _*), lit(salt.toLong)).cast("int"))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }

  /** J5: lineitem ⋈ part via salted join, aggregated per brand —
    * oracle-matched against the plain join, proving salting is
    * result-transparent.
    */
  private def j5SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    saltedJoin(l, p, "p_partkey", Seq("l_orderkey", "l_linenumber"), salt = 8)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("p_brand"))
  }

  private val j5Sql =
    s"""SELECT p_brand, COUNT(*) AS n,
       |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "j5_salted_join" -> Q(j5SaltedJoin, Some(j5Sql)),
  )
}
