package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Q
import graft.util.Det._

/** SparkEntry registration for the Structured Streaming surface. The
  * streaming tumbling-window aggregate produces exactly the same result as
  * the batch EventOps e1 query, so it shares a DuckDB oracle — proving
  * batch/stream equivalence through the driver's own gate.
  */
object StreamQueries {

  private def e4Stream(s: SparkSession, d: String): DataFrame =
    EventStream.runToCompletion(s, d, s"stream_tumbling_${System.nanoTime()}")
      .orderBy(col("hour"), col("event_type"))

  private val e4Sql =
    s"""SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
       |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "e4_stream_tumbling" -> Q(e4Stream, Some(e4Sql)),
  )
}
