package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Typed Dataset[T] surface (SURVEY.md §1.4 decision: case-class Datasets
  * at module boundaries where compile-time field checks pay). The typed
  * plan compiles to the same Catalyst operators as the untyped one — this
  * query shares semantics with a DuckDB oracle to prove it.
  */
object TypedOps {

  final case class Lineitem(
      l_orderkey: Long,
      l_quantity: Double,
      l_extendedprice: Double,
      l_returnflag: String,
      l_linestatus: String)

  final case class FlagStats(
      l_returnflag: String,
      n: Long,
      sum_qty: Double,
      max_price: Double)

  def flagStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus")
      .as[Lineitem]
    ds.groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var sq = 0.0; var mx = Double.MinValue
        rows.foreach { r =>  // quantities are integral-valued: exact in any order
          n += 1; sq += r.l_quantity
          if (r.l_extendedprice > mx) mx = r.l_extendedprice
        }
        FlagStats(flag, n, sq, mx)
      }
      .toDF()
      .orderBy(col("l_returnflag"))
  }

  private val t6Sql =
    """SELECT l_returnflag, COUNT(*) AS n, SUM(l_quantity) AS sum_qty,
      |       MAX(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "t6_typed_dataset" -> Q(flagStats, Some(t6Sql)),
  )
}
