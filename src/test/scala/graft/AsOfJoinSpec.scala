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

  test("af4: the leakage rule — an event is enriched by the PREVIOUS " +
      "week's version, never its own week's") {
    // user 1: week-1 events sum to 300 cents; a week-2 event must see
    // ver_cents = 300 (week-1's aggregate, valid from week 2), and the
    // week-1 events themselves must be unenriched (no earlier version).
    // Mondays: 2024-01-01 and 2024-01-08 are consecutive week starts.
    val events = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, Timestamp.valueOf("2024-01-03 10:00:00"), 2.0),
      (3L, 1L, Timestamp.valueOf("2024-01-08 09:00:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    import org.apache.spark.sql.expressions.Window
    // replicate pitEnrich inline against THIS frame (the registered op
    // derives versions from the corpus; here we pin the semantics)
    val vers = events.groupBy(col("user_id"),
        date_trunc("week", col("ts")).as("_wk"))
      .agg(sum(round(col("value") * 100).cast("long")).as("ver_cents"))
      .select(col("user_id"),
        (col("_wk") + expr("INTERVAL 7 DAYS")).as("eff_from"),
        col("ver_cents"))
    val enr = AsOfJoin.asofJoin(
        events.select(col("user_id"), col("event_id"), col("ts")),
        vers, "user_id", "ts", "eff_from")
      .join(vers.select(col("user_id"),
          col("eff_from").as("asof_eff_from"), col("ver_cents")),
        Seq("user_id", "asof_eff_from"), "left")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("ver_cents"))).toMap
    assert(enr(1L).isEmpty && enr(2L).isEmpty,
      "week-1 events must have no servable version yet")
    assert(enr(3L).contains(300L),
      s"week-2 event must see week-1's 300-cent version, got ${enr(3L)}")
  }

  test("af5: skew audit counts exactly the events whose PIT feature " +
      "differs from latest-value serving, null PIT included") {
    // user 1 versions: 100 cents (eff w2), 200 cents (eff w3) → latest 200
    //   e1 before w2: pit null  vs latest 200 → skewed, delta 200
    //   e2 in w2:     pit 100   vs latest 200 → skewed, delta 100
    //   e3 after w3:  pit 200   =  latest     → clean,  delta 0
    // user 2 has events but NO latest row (left-join null path): pit null
    // vs latest null → NOT skewed (both unknown), delta 0
    val enriched = Seq(
      (1L, 1L, None: Option[Long]),
      (1L, 2L, Some(100L)),
      (1L, 3L, Some(200L)),
      (2L, 4L, None: Option[Long]))
      .toDF("user_id", "event_id", "ver_cents")
    val latest = Seq((1L, 200L)).toDF("user_id", "latest_cents")
    val got = AsOfJoin.skewAudit(enriched, latest).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(1L -> ((3L, 2L, 300L)), 2L -> ((1L, 0L, 0L))))
  }

  test("e24: streamed PIT enrichment equals the batch af4 exactly") {
    def rows(q: String) = SparkEntry.queries(q)(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val batch = rows("af4_pit_enrich")
    val streamed = rows("e24_stream_pit")
    assert(streamed === batch)
    assert(batch.nonEmpty)
    // and the streamed result really came through per-batch commits
    val dir = new java.io.File(AsOfJoin.e24ResultDir(spark, Sf0001))
    val batches = dir.listFiles().count(_.getName.startsWith("batch="))
    assert(batches >= 2, s"expected multiple micro-batch commits, $batches")
  }
}
