package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.relational.BloomJoin
import graft.sources.ZOrderLanding

/** Round-6 warehouse/lakehouse operators: bloom pre-filter join (j7),
  * SCD2 history (cdc1), z-order landing (s12), edit-distance near-dup
  * (d10), retention cohorts (e13), ordered funnel (e14). The oracle
  * gates pin all six against DuckDB on the real tables; these specs pin
  * the BOUNDARY semantics the gates can't isolate.
  */
class WarehouseOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- j7: bloom pre-filter join -----------------------------------------

  test("j7: bloom pre-filter join is result-identical to the plain join, " +
      "even with an absurd false-positive rate") {
    val fact = spark.range(0, 10000).select(col("id").as("k"),
      (col("id") % 7).as("v"))
    val dim = spark.range(0, 10000, 101).select(col("id").as("dk"),
      (col("id") * 2).as("dv"))
    val plain = fact.join(dim, col("k") === col("dk"))
      .select("k", "v", "dv").collect().toSet
    for (fpp <- Seq(0.01, 0.5)) {
      val got = BloomJoin.bloomPrefilterJoin(fact, dim, "k", "dk",
          expectedItems = 100, fpp = fpp)
        .select("k", "v", "dv").collect().toSet
      assert(got === plain, s"fpp=$fpp diverged from the plain join")
    }
  }

  test("j7: the bloom admits every dim key (no false negatives) and " +
      "actually filters the fact side") {
    val dim = spark.range(0, 1000, 10).select(col("id").as("dk"))
    val bloomed = BloomJoin.bloomPrefilterJoin(
      spark.range(0, 100000).select(col("id").as("k")), dim, "k", "dk",
      expectedItems = 100, fpp = 0.01)
    // every true match survives
    assert(bloomed.count() === 100)
    // and the pre-filter is in the plan (the scale claim)
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_"), "bloom filter missing from plan")
  }

  // ---- cdc1: SCD2 history ------------------------------------------------

  test("cdc1: versions chain half-open with exactly one current row per key") {
    val changes = Seq(
      (1L, "2024-01-01 08:00:00", 10L, 1.0),
      (1L, "2024-01-01 17:00:00", 11L, 2.0), // same day, higher tie wins
      (1L, "2024-02-01 09:00:00", 12L, 3.0),
      (2L, "2024-01-15 12:00:00", 20L, 9.0))
      .toDF("k", "ts", "tie", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val hist = relational.Scd.scd2History(changes, "k", "ts", "tie", "v")
      .orderBy("k", "effective_from").collect()
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq ===
      Seq("2024-01-01", "2024-02-01"))
    // effective_to chains to the NEXT effective_from; last is open/current
    assert(k1(0).getString(2) === "2024-02-01" && !k1(0).getBoolean(4))
    assert(k1(1).getString(2) == null && k1(1).getBoolean(4))
    // same-day dedup picked the higher tie (v = 2.0, not 1.0)
    assert(k1(0).getDouble(3) === 2.0)
    // exactly one current row per key
    assert(hist.count(_.getBoolean(4)) === 2)
  }

  // ---- s12: z-order landing ----------------------------------------------

  test("s12: zValue interleaves bits (Morton)") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (5L, 9L))
      .toDF("a", "b")
      .select(ZOrderLanding.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(a,b): a on even bits, b on odd bits
    // a=5=101, b=9=1001 → even bits 1_0_1 = 0b010001, odd 1_0_0_1 →
    // z = interleave = 0b10000011 | ... compute directly:
    def morton(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    assert(rows === Seq(morton(0, 0), morton(1, 0), morton(0, 1),
      morton(3, 3), morton(5, 9)))
  }

  /** Rows the parquet reader actually delivered (post skipping). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec =>
        f.metrics("numOutputRows").value }.sum
  }

  test("s12: z-order skips on BOTH dimensions; single-key sort cannot " +
      "skip on the other dimension") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val tmp = java.nio.file.Files.createTempDirectory("graft_s12_spec")
    try {
      // balanced 10-bit × 10-bit grid so the interleave splits both dims
      val df = spark.range(0, 1 << 16).select(
        (col("id") % 1024).as("u"),
        pmod(xxhash64(col("id")), lit(1024L)).as("m"),
        col("id").as("payload"))
      ZOrderLanding.writeZOrdered(df, s"$tmp/z", col("u"), col("m"),
        nRanges = 64)
      df.repartitionByRange(64, col("m")).sortWithinPartitions(col("m"))
        .write.parquet(s"$tmp/msorted")
      def uBand(path: String): DataFrame = spark.read.parquet(path)
        .filter(col("u") < 128).select("payload")
      def both(path: String): DataFrame = spark.read.parquet(path)
        .filter(col("u") < 128 && col("m") < 128).select("payload")
      val total = 1L << 16
      // u-only predicate: the m-sorted layout reads everything…
      assert(scanRows(uBand(s"$tmp/msorted")) > total / 2)
      // …the z-ordered layout skips most files
      assert(scanRows(uBand(s"$tmp/z")) < total / 2)
      // 2-D predicate: z-order prunes strictly harder than the 1-D sort
      val z2 = scanRows(both(s"$tmp/z"))
      val m2 = scanRows(both(s"$tmp/msorted"))
      assert(z2 < m2 / 2, s"z-order read $z2 vs m-sorted $m2")
      // layouts agree on the answer
      assert(both(s"$tmp/z").count() === both(s"$tmp/msorted").count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  // ---- d10: edit-distance near-dup ---------------------------------------

  test("d10: planted pair surfaces with its exact distance; over-threshold " +
      "and over-length-gate pairs are excluded") {
    val base = "the quick brown fox jumps over the lazy dog and then some"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("quick", "quack")),            // dist 1, same len
      (3L, base.replace("the quick", "a quicker")),    // small edits
      (4L, "z" * base.length),                         // same len, far
      (5L, base + " padded far beyond the length gate please"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val pairs = ext.DedupOps.editDistPairs(docs, maxDist = 5, lenGate = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 1L)
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case ((a, b), _) => a == 4L || b == 4L },
      "far text leaked through the distance threshold")
    assert(!pairs.exists { case ((a, b), _) => a == 5L || b == 5L },
      "over-length-gate doc leaked into candidates")
  }

  // ---- e13 / e14: cohorts and funnel boundaries --------------------------

  test("e13: cohort offsets are exact week deltas from first activity") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-15 10:00:00"), // W0, W2
      (2L, "2024-01-03 09:00:00"),                              // W0 only
      (3L, "2024-01-10 09:00:00"))                              // W1 only
      .toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val m = ext.EventOps.cohortMatrix(ev)
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cw"),
        col("week_offset"), col("active_users"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }

  test("e14: funnel is strict-order — events before the previous stage " +
      "don't convert") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L), // full
      (2L, "click", 1L), (2L, "view", 2L),   // click precedes view: no
      (3L, "view", 1L), (3L, "purchase", 2L) // no click: purchase ignored
    ).toDF("user_id", "event_type", "t")
      .withColumn("ts", timestamp_seconds(col("t")))
    val r = ext.EventOps.funnelCounts(ev).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3L, 1L, 1L)))
  }

  test("cdc2: merge actions — delete drops, update wins, insert lands, " +
      "absent-key delete no-ops") {
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "bal")
    val chg = Seq((1L, "D", 99L), (2L, "U", 200L), (4L, "I", 400L),
      (5L, "D", 500L)).toDF("k", "op", "val")
    val out = relational.Scd.scd1Merge(base, chg).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((2L, "updated", 200L), (3L, "kept", 30L),
      (4L, "inserted", 400L)))
  }
}
