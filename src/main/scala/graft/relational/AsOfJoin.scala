package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** As-of join — "for each left row, the most recent right row at or
  * before its timestamp, per key". Spark has no native operator for this;
  * per the extension preference order we COMPOSE it from built-ins
  * (union + one window pass) rather than writing a SparkPlan: both sides
  * shuffle once on the key and sort once on (ts, side) — exactly the
  * physical shape a dedicated AsOfJoinExec would produce.
  *
  * The DuckDB oracle uses its *native* ASOF JOIN, so the driver's hash
  * gate proves the composition implements the same semantics (inclusive
  * match: a right row at exactly the left timestamp matches).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     reference side (must contain keyCol + rightTime)
    * @param keyCol    equality key
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @return left rows + `asof_<rightTime>`: the greatest rightTime ≤
    *         leftTime for the key (null when none)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTime: String, rightTime: String): DataFrame = {
    val l = left.withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumn("_rt", lit(null).cast(right.schema(rightTime).dataType))
    val r = right.select(col(keyCol), col(rightTime))
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumn("_rt", col(rightTime))
    val lCols = left.columns.toIndexedSeq
    val unioned = l.select((lCols.map(col) :+ col("_t") :+ col("_side") :+ col("_rt")): _*)
      .unionByName(
        r.select((lCols.map(c => if (c == keyCol) col(c) else lit(null).as(c))
          :+ col("_t") :+ col("_side") :+ col("_rt")): _*),
        allowMissingColumns = false)
    // right rows sort BEFORE left rows at equal _t (side 0 < 1): inclusive
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightTime", last(col("_rt"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_t", "_side", "_rt")
  }

  /** AF1: for each click event, the most recent view event of the same
    * user at or before it; aggregated to per-user counts + matched share
    * and total gap (exact integer seconds — deterministic).
    */
  private def af1Asof(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    asofJoin(clicks, views, "user_id", "ts", "view_ts")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        count(col("asof_view_ts")).as("n_matched"),
        sum(expr("(unix_micros(ts) - unix_micros(asof_view_ts)) div 1000000"))
          .as("total_gap_s"))
      .orderBy(col("user_id"))
  }

  private val af1Sql =
    """SELECT c.user_id AS user_id, COUNT(*) AS n_clicks,
      |  COUNT(v.view_ts) AS n_matched,
      |  CAST(SUM((EPOCH_US(c.ts) - EPOCH_US(v.view_ts)) // 1000000) AS BIGINT) AS total_gap_s
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
      |ASOF LEFT JOIN (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view') v
      |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
      |GROUP BY c.user_id ORDER BY 1""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "af1_asof_join" -> Q(af1Asof, Some(af1Sql)),
  )
}
