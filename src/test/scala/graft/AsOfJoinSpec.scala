package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.relational.{AsOfJoin, RangeJoin}

/** Planted edge cases for the as-of join composition: inclusive equal-ts
  * match, no-match nulls, and agreement with a local brute force.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof: inclusive match, latest-at-or-before, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),   // exact tie with right
      (1L, 11L, ts("2024-01-01 12:00:00")),   // between rights
      (2L, 20L, ts("2024-01-01 09:00:00")),   // before any right
      (3L, 30L, ts("2024-01-01 10:00:00"))    // key with no rights at all
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 10:30:00"))
    ).toDF("k", "rt")

    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt")
      .select("id", "asof_rt").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

    assert(out(10L) === Some(ts("2024-01-01 10:00:00")))  // inclusive
    assert(out(11L) === Some(ts("2024-01-01 11:00:00")))  // latest ≤ t
    assert(out(20L) === None)                             // all rights later
    assert(out(30L) === None)                             // no rights
  }

  test("asof matches a brute-force reimplementation on real events") {
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val got = AsOfJoin.asofJoin(clicks, views, "user_id", "ts", "view_ts")
      .collect()
      .map(r => r.getLong(1) -> Option(r.getTimestamp(3))).toMap

    val vLocal = views.collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    clicks.collect().foreach { c =>
      val expect = vLocal.getOrElse(c.getLong(0), Array.empty[Timestamp])
        .filter(!_.after(c.getTimestamp(2)))
        .sortBy(_.getTime).lastOption
      assert(got(c.getLong(1)) === expect, s"event ${c.getLong(1)}")
    }
  }

  test("binned range join equals the naive range join, without nested loops") {
    val events = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("user_id"), col("ts"))
    val sess = graft.ext.EventOps.sessions(Tables.events(spark, Sf0001))
      .select(col("user_id"), col("session_id"),
        col("session_start"), col("session_end"))
    val binned = RangeJoin.binnedRangeJoin(events, sess, "user_id",
        "ts", "session_start", "session_end", binUs = 3600L * 1000000L)
      .select("event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = events.join(sess,
        events("user_id") === sess("user_id") &&
          col("ts") >= col("session_start") && col("ts") <= col("session_end"))
      .select("event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive)
    assert(binned.size === events.count())   // every event in exactly one session

    // tiny bins (expansion >> 1) must not change the result either
    val tiny = RangeJoin.binnedRangeJoin(events, sess, "user_id",
        "ts", "session_start", "session_end", binUs = 60L * 1000000L)
      .select("event_id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tiny === naive)

    // the claim the operator exists for: an equi-join plan, no nested loop
    val df = SparkEntry.queries("af2_range_join")(spark, Sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1500))
  }
}
