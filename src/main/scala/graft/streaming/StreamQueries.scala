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
    // fixed name: runToCompletion drops the previous run's table, so a
    // shared session holds at most ONE result copy (nanoTime-suffixed
    // names accumulated one driver-memory table per invocation)
    EventStream.runToCompletion(s, d, "graft_stream_tumbling")
      .orderBy(col("hour"), col("event_type"))

  // shared with batch e1 by reference (same discipline as e11/e10)
  private val e4Sql = graft.ext.EventOps.e1Sql

  /** E11: the sliding-window aggregate (e10's expression) under
    * Structured Streaming — batch/stream equivalence through the shared
    * epoch-aligned time_bucket oracle, like e4 shares e1's.
    */
  private def e11StreamSliding(s: SparkSession, d: String): DataFrame =
    EventStream.runSlidingToCompletion(s, d, "graft_stream_sliding")
      .orderBy(col("ws"), col("event_type"))

  // ONE definition: referencing EventOps' text (not copying it) is what
  // makes "shares e10's oracle" true — a future oracle fix can't drift
  // the stream gate from the batch gate.
  private val e11Sql = graft.ext.EventOps.e10Sql

  /** E6: the stateful sessionizer (flatMapGroupsWithState) run to
    * completion. Closed sessions over a finite stream = the batch
    * gaps-and-islands sessions MINUS each user's last session (it never
    * closes — no later event arrives) — which the oracle derives
    * independently with window SQL. Robust to micro-batch splits: a
    * session closed in any later batch still emits exactly once.
    */
  private def e6StreamSessions(s: SparkSession, d: String): DataFrame =
    EventStream.runSessionsToCompletion(s, d, "graft_stream_sessions")
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .orderBy(col("user_id"), col("start_us"))

  private val e6Sql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged
      |), agg AS (
      |  SELECT user_id, session_id,
      |    EPOCH_US(MIN(ts)) AS start_us, EPOCH_US(MAX(ts)) AS end_us,
      |    CAST(COUNT(*) AS BIGINT) AS n_events
      |  FROM sessions GROUP BY 1, 2)
      |SELECT user_id, start_us, end_us, n_events FROM agg
      |WHERE session_id < (SELECT MAX(a2.session_id) FROM agg a2
      |                    WHERE a2.user_id = agg.user_id)
      |ORDER BY user_id, start_us""".stripMargin

  /** E7: exactly-once from at-least-once — every event delivered twice
    * (duplicate-delivery landing dir), watermark-scoped dedup on
    * event_id; the output must equal the events table row-for-row, which
    * is exactly what the oracle checks.
    */
  private def e7StreamDedup(s: SparkSession, d: String): DataFrame =
    EventStream.runDedupToCompletion(s, d, "graft_stream_dedup")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))

  private val e7Sql =
    """SELECT event_id, user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** E8: stream-static enrichment — events joined to the broadcast
    * customer dimension per micro-batch, aggregated by segment; equals
    * the batch join+agg, which is the oracle.
    */
  private def e8StreamEnriched(s: SparkSession, d: String): DataFrame =
    EventStream.runEnrichedToCompletion(s, d, "graft_stream_enriched")
      .orderBy(col("c_mktsegment"))

  private val e8Sql =
    s"""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n,
       |  ${sqlDsum("value")} AS sum_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** E9: stream-stream interval join (click → purchase within 30 min,
    * same user), both sides watermarked so state is bounded; over the
    * finite stream the emitted pairs equal the batch interval join,
    * which is the oracle.
    */
  private def e9StreamJoin(s: SparkSession, d: String): DataFrame =
    EventStream.runIntervalJoinToCompletion(s, d, "graft_stream_ivjoin")
      .orderBy(col("click_id"), col("purchase_id"))

  private val e9Sql =
    """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
      |  epoch_us(b.ts) - epoch_us(a.ts) AS delta_us
      |FROM events a JOIN events b ON a.user_id = b.user_id
      | AND a.event_type = 'click' AND b.event_type = 'purchase'
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  /** E16: streaming materialized-view maintenance — the streaming
    * complement of batch mv1. The rollup is maintained incrementally
    * across four micro-batches (update mode emits each touched key's
    * complete new aggregate; foreachBatch appends it to the upsert log,
    * the portable MERGE-INTO stand-in), and the MV is last-writer-wins
    * per key over the log. The oracle is the batch rollup over all
    * events: the incremental path may invent or lose nothing.
    */
  private def e16StreamUpsert(s: SparkSession, d: String): DataFrame =
    EventStream.runUpsertRollupToCompletion(s, d)
      .orderBy(col("day"), col("event_type"))

  private val e16Sql =
    s"""SELECT DATE_TRUNC('day', ts) AS day, event_type,
       |  CAST(COUNT(*) AS BIGINT) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** E18: streaming heavy hitters — per-user frequency tracking whose
    * state is BOUNDED (k entries per bucket, k×buckets total) instead of
    * key-sized, the only per-key tracker shape that survives 10⁹ users.
    * Bounded-gate oracle (the a7/a10 discipline): the result rows carry
    * the exact top-10 user counts (engine-neutral — DuckDB recomputes
    * them) plus flags the Misra–Gries theorem makes deterministically
    * TRUE for any arrival order: the user survives the sketch (its true
    * count exceeds its bucket's n/k by a wide margin at both SFs) and
    * the estimate sits within [exact − ⌊n_bucket/k⌋, exact].
    */
  private def e18StreamHH(s: SparkSession, d: String): DataFrame = {
    val K = 64
    val Buckets = 32
    val sketch = EventStream.runHeavyHittersToCompletion(s, d, K, Buckets)
    val ev = graft.Tables.events(s, d)
    val exact = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
    val bucketN = ev
      .groupBy(pmod(col("user_id"), lit(Buckets.toLong)).cast("int")
        .as("bucket"))
      .agg(count(lit(1)).as("n_bucket"))
    exact.orderBy(col("n_exact").desc, col("user_id")).limit(10)
      .withColumn("bucket",
        pmod(col("user_id"), lit(Buckets.toLong)).cast("int"))
      .join(broadcast(bucketN), "bucket")
      .join(broadcast(sketch.select(col("user_id"), col("est"))),
        Seq("user_id"), "left")
      .select(col("user_id"), col("n_exact"),
        col("est").isNotNull.as("in_sketch"),
        (col("est").isNotNull && col("est") <= col("n_exact") &&
          col("est") >= col("n_exact") - floor(col("n_bucket") / K))
          .as("est_ok"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  private val e18Sql =
    """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact,
      |  TRUE AS in_sketch, TRUE AS est_ok
      |FROM events GROUP BY user_id
      |ORDER BY n_exact DESC, user_id LIMIT 10""".stripMargin

  /** E25: late-data observability — the per-batch accepted/dropped
    * counters a production pipeline alerts on, made exact by planting
    * the late slices deterministically (id-keyed, timestamp-shifted
    * replays; see [[EventStream.runLateObservedToCompletion]]). The
    * oracle recomputes both planted counts from the events table.
    */
  private def e25LateObserved(s: SparkSession, d: String): DataFrame =
    EventStream.runLateObservedToCompletion(s, d, "graft_stream_late_obs")
      .orderBy(col("batch"))

  private val e25Sql =
    """SELECT CAST(0 AS BIGINT) AS batch,
      |  CAST(COUNT(*) AS BIGINT) AS n_input,
      |  CAST(0 AS BIGINT) AS n_late_dropped
      |FROM events
      |UNION ALL
      |SELECT 1, 1, 0
      |UNION ALL
      |SELECT 2,
      |  CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1
      |           WHEN event_id % 89 = 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events
      |ORDER BY batch""".stripMargin

  /** E27: the transactional streaming sink — micro-batches committed
    * into the s19 OCC manifest store with batch-containment exactly-once
    * and snapshot-isolated readers (see [[EventStream.txnCommitBatch]]).
    * The head version must hold the stream's rows exactly once, so the
    * oracle is the plain per-type aggregate over events; `n_versions`
    * pins the structural shape (empty base + one atomic commit per
    * micro-batch).
    */
  private def e27StreamTxnSink(s: SparkSession, d: String): DataFrame = {
    val dir = EventStream.e27Dir(s, d)
    val h = graft.sources.Snapshots.head(dir)
    graft.sources.Snapshots.readVersion(s, dir, h)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("event_type"), lit(h.toLong).as("n_versions"),
        col("n"), col("sum_value"))
      .orderBy(col("event_type"))
  }

  private val e27Sql =
    s"""SELECT event_type, CAST(5 AS BIGINT) AS n_versions,
       |  CAST(COUNT(*) AS BIGINT) AS n, ${sqlDsum("value")} AS sum_value
       |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "e4_stream_tumbling" -> Q(e4Stream, Some(e4Sql)),
    "e27_stream_txn_sink" -> Q(e27StreamTxnSink, Some(e27Sql)),
    "e25_late_observability" -> Q(e25LateObserved, Some(e25Sql)),
    "e18_stream_heavyhitters" -> Q(e18StreamHH, Some(e18Sql)),
    "e16_stream_upsert_mv" -> Q(e16StreamUpsert, Some(e16Sql)),
    "e11_stream_sliding" -> Q(e11StreamSliding, Some(e11Sql)),
    "e9_stream_interval_join" -> Q(e9StreamJoin, Some(e9Sql)),
    "e6_stream_sessions" -> Q(e6StreamSessions, Some(e6Sql)),
    "e7_stream_dedup"    -> Q(e7StreamDedup, Some(e7Sql)),
    "e8_stream_enriched" -> Q(e8StreamEnriched, Some(e8Sql)),
  )
}
