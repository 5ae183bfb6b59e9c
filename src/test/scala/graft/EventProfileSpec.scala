package graft

import org.apache.spark.sql.functions._
import graft.ext.MultimodalOps

/** Invariant specs for sessionization, profiling, and multimodal plumbing
  * — the oracle pins the values; these pin the semantics.
  */
class EventProfileSpec extends SparkSpec {

  test("e23: last-touch credits the latest in-window touch; after-purchase, " +
      "out-of-window, and touch-free purchases fall to unattributed") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // u1: click then view before the purchase -> view wins (latest)
      (1L, t("2024-01-05 10:00:00"), 1L, "click"),
      (2L, t("2024-01-05 11:00:00"), 1L, "view"),
      (3L, t("2024-01-05 12:00:00"), 1L, "purchase"),
      // u2: purchase with no touch at all
      (4L, t("2024-01-05 09:00:00"), 2L, "purchase"),
      // u3: only touch is OUTSIDE the 3-day window
      (5L, t("2024-01-01 12:00:00"), 3L, "view"),
      (6L, t("2024-01-10 12:00:00"), 3L, "purchase"),
      // u4: only touch is AFTER the purchase
      (7L, t("2024-01-05 08:00:00"), 4L, "purchase"),
      (8L, t("2024-01-05 09:00:00"), 4L, "click"),
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ext.EventOps.lastTouchAttribution(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map(
      "unattributed" -> ((3L, 0.75)),
      "view" -> ((1L, 0.25))))
  }

  test("session_window: exact-gap boundary MERGES, beyond-gap splits") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val ev = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(10)),
      (3L, 1L, ts(40)),                    // gap == 30 min exactly -> MERGES
      (4L, 1L, ts(50)),
      (5L, 1L, ts(81)),                    // 31-min gap -> new session
      (6L, 2L, ts(0))                      // other user
    ).toDF("event_id", "user_id", "ts")
    val out = ev.groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("w.end"), col("n"))
      .orderBy(col("user_id"), col("w.start"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(out === Array(
      (1L, ts(0), ts(80), 4L),     // 0,10,40,50 coalesce; end = 50 + 30
      (1L, ts(81), ts(111), 1L),   // split strictly beyond the gap
      (2L, ts(0), ts(30), 1L)))
  }

  test("s9: ORC read path pushes the filter into the ORC scan") {
    val df = SparkEntry.queries("s9_orc_roundtrip")(spark, Sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("OrcScan") || plan.contains("Format: ORC")
      || plan.toLowerCase.contains("orc"), s"not an ORC scan:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), " +
      "GreaterThan(o_totalprice,50000.0)]"),
      s"filter not pushed into the ORC reader:\n$plan")
  }

  test("s14: XML round-trip is value-exact vs the parquet source, " +
      "including doubles") {
    val viaXml = SparkEntry.queries("s14_xml_roundtrip")(spark, Sf0001)
    assert(viaXml.queryExecution.executedPlan.toString.toLowerCase
      .contains("xml"), "s14 must read through the XML source")
    val direct = Tables.supplier(spark, Sf0001)
      .filter(col("s_acctbal") > 0.0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        graft.util.Det.dsum(col("s_acctbal")).as("sum_bal"))
      .orderBy(col("s_nationkey"))
    // text round-trip must lose nothing: Double.toString/parse is exact
    assert(viaXml.collect().toSeq === direct.collect().toSeq,
      "XML landing diverged from the parquet source")
  }

  test("sessionization: no within-session gap exceeds 30 min, session count sane") {
    val sessions = SparkEntry.queries("e2_sessionization")(spark, Sf0001)
    val ev = Tables.events(spark, Sf0001)
    // total events preserved
    assert(sessions.agg(sum("n_events")).head().getLong(0) === ev.count())
    // session windows of the same user never overlap
    val rows = sessions.orderBy("user_id", "session_id").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      ss.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getTimestamp(3).getTime - a.getTimestamp(4).getTime
          assert(gap > 1800L * 1000, s"consecutive sessions closer than the gap: $gap ms")
        case _ =>
      }
    }
  }

  test("describeAll: whole-frame describe — string rows count-only, " +
    "numeric rows match describeNumeric (reference stroke_predict.py:26)") {
    // the reference's own mixed frame: the stroke CSV
    val df = pipeline.StrokePipeline.readCsv(spark,
      pipeline.StrokePipeline.RawCsv)
    val all = profile.Profiling.describeAll(df, df.columns.toSeq)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(all.size === df.columns.length)     // every column gets a row
    val gender = all("gender")                 // string: count-only
    assert(gender.getAs[Long]("n") === 5110L)
    assert(gender.isNullAt(gender.fieldIndex("mean")))
    assert(gender.isNullAt(gender.fieldIndex("max")))
    val age = all("age")                       // numeric: full stats
    assert(age.getAs[Long]("n") === 5110L)
    assert(math.abs(age.getAs[Double]("mean") - 43.226614) < 1e-4)
    assert(age.getAs[Double]("max") === 82.0)
  }

  test("histogramAuto: Sturges bin count, counts partition the rows") {
    val orders = Tables.orders(spark, Sf0001)
    val h = profile.Profiling.histogramAuto(orders, "o_totalprice").collect()
    val n = orders.count()
    val nbins = math.ceil(math.log(n.toDouble) / math.log(2.0)).toLong + 1
    assert(h.map(_.getLong(1)).sum === n)                      // no row lost
    assert(h.map(_.getLong(0)).forall(b => b >= 0 && b < nbins))
    assert(h.map(_.getLong(0)).max === nbins - 1)              // max folds in
  }

  test("describeNumeric matches Spark's describe() values") {
    val li = Tables.lineitem(spark, Sf0001)
    val ours = profile.Profiling.describeNumeric(li, Seq("l_quantity"))
      .head()
    val theirs = li.describe("l_quantity").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ours.getAs[Long]("n") === theirs("count").toLong)
    assert(math.abs(ours.getAs[Double]("mean") - theirs("mean").toDouble) < 1e-6)
    assert(math.abs(ours.getAs[Double]("stddev") - theirs("stddev").toDouble) < 1e-6)
    assert(ours.getAs[Double]("min") === theirs("min").toDouble)
    assert(ours.getAs[Double]("max") === theirs("max").toDouble)
  }

  test("histogram bins partition all rows") {
    val o = Tables.orders(spark, Sf0001)
    val hist = profile.Profiling.histogram(o, "o_totalprice", 0.0, 50000.0)
    assert(hist.agg(sum("n")).head().getLong(0) === o.count())
  }

  test("multimodal: batch decode is deterministic and preserves rows") {
    val docs = Tables.documents(spark, Sf0001)
    val a = MultimodalOps.extractFeatures(spark, MultimodalOps.asMediaTable(docs))
    assert(a.count() === docs.count())
    val f1 = a.orderBy("doc_id").head()
    val f2 = MultimodalOps.extractFeatures(spark, MultimodalOps.asMediaTable(docs))
      .orderBy("doc_id").head()
    assert(f1.getSeq[Float](3) === f2.getSeq[Float](3))
    // metadata digest matches an independent sha2 computation
    val meta = MultimodalOps.asMediaTable(docs)
      .select(col("meta.digest"), sha2(col("payload").cast("string"), 256))
      .head()
    assert(meta.getString(0) === meta.getString(1))
  }

  test("frame sampling: every-Nth selection and full coverage at N=1") {
    val docs = Tables.documents(spark, Sf0001).limit(20)
    val all = MultimodalOps.sampleFrames(docs, frameBytes = 64, everyNth = 1)
    val sampled = MultimodalOps.sampleFrames(docs, frameBytes = 64, everyNth = 2)
    assert(sampled.count() < all.count())
    assert(sampled.filter(col("frame_no") % 2 =!= 0).count() === 0)
    // N=1 frames reassemble to the original char length
    val reassembled = all.groupBy("doc_id").agg(sum("frame_bytes").as("total"))
      .join(docs.select(col("doc_id"), length(col("text")).cast("long").as("len")), "doc_id")
      .filter(col("total") =!= col("len")).count()
    assert(reassembled === 0)
  }

  // ---- e19 gap-fill ------------------------------------------------------

  test("e19: gaps interpolate linearly, edges stay exact, spans are per-user") {
    import spark.implicits._
    def day(d: String) = java.sql.Timestamp.valueOf(s"2024-01-0$d 00:00:00")
    val daily = Seq(
      (1L, day("1"), 10.0), (1L, day("4"), 40.0),   // 2-day gap
      (2L, day("2"), 5.0),                          // single-day user
      (3L, day("1"), 1.0), (3L, day("3"), 2.0))     // non-integer midpoint
      .toDF("user_id", "day", "v")
    val out = graft.ext.EventOps.gapFillDaily(daily).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("day").toString.take(10),
        r.getAs[Boolean]("filled"), r.getAs[Double]("value")))
    // user 1: 4 calendar days, interior gap interpolated 10→40
    val u1 = out.filter(_._1 == 1L)
    assert(u1.map(_._4).toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    assert(u1.map(_._3).toSeq == Seq(false, true, true, false))
    // user 2: no spine beyond its single observed day (no edge rows)
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, "2024-01-02", false, 5.0)))
    // user 3: fractional interpolation lands exactly between
    assert(out.filter(t => t._1 == 3L && t._3).map(_._4).toSeq == Seq(1.5))
    // spine is gapless and sorted per user
    assert(out.filter(_._1 == 1L).map(_._2).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
  }

  test("ts1: constant-plus-impulse series decomposes in closed form — " +
      "flat trend, zero seasonal medians, the impulse isolated in the " +
      "residual") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 28 constant days (1000 cents) with a +700 impulse on day index 14:
    // full 7-day windows exist for indices 3..24; windows containing the
    // impulse (indices 11..17) get trend7 = 7700, the rest 7000;
    // detr7 = 7·cents − trend7 → +4200 on the impulse day, −700 on its
    // six window neighbours, 0 elsewhere. Each day-of-week contributes
    // ≥3 full-window days and at most one is impulse-affected, so every
    // weekday's LOWER MEDIAN is 0 → seas7 = 0 and resid7 = detr7.
    val daily = (0 until 28).map { i =>
      (java.sql.Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(i).atStartOfDay()),
        if (i == 14) 1700L else 1000L)
    }.toDF("day", "cents")
    val got = ext.EventOps.seasonalDecompose(daily).collect()
      .map(r => r.getTimestamp(0).toLocalDateTime.getDayOfMonth - 1 ->
        ((r.getAs[Long]("trend7"), r.getAs[Long]("detr7"),
          r.getAs[Long]("seas7"), r.getAs[Long]("resid7"))))
      .toMap
    assert(got.keySet === (3 to 24).toSet, "full windows only")
    for (i <- 3 to 24) {
      val inImpulseWindow = i >= 11 && i <= 17
      val expTrend = if (inImpulseWindow) 7700L else 7000L
      val expDetr =
        if (i == 14) 4200L else if (inImpulseWindow) -700L else 0L
      assert(got(i) === ((expTrend, expDetr, 0L, expDetr)), s"day $i")
    }
  }
}
