package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeBinRule

/** Plan + semantics contract for the injected range-join optimizer rule
  * (plans/RangeBinRule, wired through spark.sql.extensions — SparkSpec's
  * builder carries the config, so the shared test session exercises the
  * real injection path, not a hand-constructed rule invocation).
  */
class RangeBinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    (1L, -9L), (2L, -1L), (3L, 0L), (4L, 5L), (5L, 17L), (6L, 100L))
    .toDF("pid", "v")
  private def intervals = Seq(
    (10L, -10L, -2L), (11L, 0L, 9L), (12L, 4L, 4L), (13L, 30L, 20L))
    .toDF("iid", "lo", "hi")

  /** Final AQE plan as text — query stages are leaf nodes, so tree
    * traversal misses subtrees the string form still shows. */
  private def planString(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  private def withWidth[A](w: String)(body: => A): A = {
    val prev = spark.conf.getOption(RangeBinRule.WidthKey)
    spark.conf.set(RangeBinRule.WidthKey, w)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(RangeBinRule.WidthKey, v)
      case None    => spark.conf.unset(RangeBinRule.WidthKey)
    }
  }

  private def rangeJoin(): DataFrame =
    points.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("pid"), col("iid")).orderBy(col("pid"), col("iid"))

  test("rule off: non-equi join is a nested-loop; rule on: binned " +
      "hash join, identical rows (negatives, empty interval included)") {
    val naive = rangeJoin()
    assert(planString(naive).contains("BroadcastNestedLoopJoin"),
      "baseline should be the nested-loop plan the rule exists to kill")
    val expect = naive.collect().toSeq

    withWidth("4") {
      val opt = rangeJoin()
      val plan = planString(opt)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      assert(plan.contains("Generate explode"),
        s"interval side should explode to bins:\n$plan")
      assert(opt.collect().toSeq === expect)
    }
  }

  test("strict bounds and reversed operand order still fire and agree") {
    def q() = points.join(intervals,
        col("lo") < col("v") && col("hi") > col("v"))
      .select(col("pid"), col("iid")).orderBy(col("pid"), col("iid"))
    val expect = q().collect().toSeq
    withWidth("4") {
      val opt = q()
      assert(!planString(opt).contains("BroadcastNestedLoopJoin"))
      assert(opt.collect().toSeq === expect)
    }
  }

  test("a cross-side equi conjunct suppresses the rewrite") {
    withWidth("4") {
      val df = points.join(intervals,
        col("pid") === col("iid") - 9L &&
          col("v") >= col("lo") && col("v") <= col("hi"))
      assert(!planString(df).contains("Generate explode"),
        "equi-joins must be left to Spark's own hash join")
    }
  }

  test("null points and null bounds drop rows identically to the naive join") {
    val p = Seq((1L, Some(3L)), (2L, None)).toDF("pid", "v")
    val i = Seq((10L, Some(0L), Some(9L)), (11L, None, Some(9L)))
      .toDF("iid", "lo", "hi")
    def q() = p.join(i, col("v") >= col("lo") && col("v") <= col("hi"))
      .select(col("pid"), col("iid"))
    val expect = q().collect().toSeq
    withWidth("4")(assert(q().collect().toSeq === expect))
    assert(expect === Seq(org.apache.spark.sql.Row(1L, 10L)))
  }

  test("timestamp point-in-interval joins fire too (µs bin width) and " +
      "agree with the naive plan") {
    // deterministic probe set: LIMIT without ORDER BY may pick different
    // rows on the naive and optimized runs (they execute independently)
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id")).limit(500)
    val iv = Tables.events(spark, Sf0001)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
    def q() = ev.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .groupBy(col("event_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("event_id"))
    val expect = q().collect().toSeq
    withWidth((3600L * 1000000L).toString) { // 1h bins in µs
      val opt = q()
      val plan = planString(opt)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"no fire:\n$plan")
      assert(opt.collect().toSeq === expect)
    }
  }

  test("TIMESTAMP_NTZ point-in-interval joins fire without an unresolved " +
      "NTZ cast and agree with the naive plan") {
    // isBinnable advertises NTZ; toLong must build the NTZ→LTZ Cast with
    // an explicit session timeZoneId or the rewrite NPEs at evaluation
    val base = Seq(
      (1L, "2024-01-01 00:10:00"), (2L, "2024-01-01 03:20:00"),
      (3L, "2024-01-02 12:00:00"), (4L, "2024-01-05 23:59:59"))
      .toDF("event_id", "s")
      .select(col("event_id"), col("s").cast("timestamp_ntz").as("ts"))
    val iv = Seq(
      (10L, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
      (11L, "2024-01-02 00:00:00", "2024-01-03 00:00:00"))
      .toDF("iid", "a", "b")
      .select(col("iid"), col("a").cast("timestamp_ntz").as("lo"),
        col("b").cast("timestamp_ntz").as("hi"))
    def q() = base.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      .select(col("event_id"), col("iid")).orderBy(col("event_id"))
    val expect = q().collect().toSeq
    assert(expect.map(_.getLong(0)) === Seq(1L, 2L, 3L))
    withWidth((3600L * 1000000L).toString) {
      val opt = q()
      val plan = planString(opt)
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"no fire:\n$plan")
      assert(opt.collect().toSeq === expect)
    }
  }

  test("injected kernels resolve in a fresh session state from pure SQL " +
      "(no programmatic register call)") {
    // newSession() rebuilds SessionState from the extensions, so this
    // exercises the injectFunction path, not a leftover runtime ensure
    val s2 = spark.newSession()
    val dot = s2.sql(
      """SELECT fdot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d
        |""".stripMargin).head().getDouble(0)
    assert(dot === 11.0)
    val sim = s2.sql("SELECT simhash64k('a b c a b') AS h").head().getLong(0)
    assert(sim !== 0L)
  }

  test("af3 registered query returns week-window counts on sf0.001") {
    val out = SparkEntry.queries("af3_range_join_rule")(spark, Sf0001)
    assert(out.columns.toSeq === Seq("o_orderkey", "n_lines", "sum_qty"))
    assert(out.count() > 0)
  }
}
