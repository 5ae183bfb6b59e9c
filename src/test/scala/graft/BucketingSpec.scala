package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ext.Sampling

/** Bucketing: pre-shuffling at write time so co-located joins skip the
  * exchange entirely — the central layout decision for repeated fact-fact
  * joins at 100 TB. Asserted at the plan level: the bucketed join must
  * contain NO shuffle (Exchange) on the bucketed keys.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle") {
    // warehouse dir is a static conf — SparkSpec points it at a temp dir
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.orders(spark, Sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))

    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last   // below the agg
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      "bucketed join still shuffles:\n" + plan.take(2000))

    // and the result matches the plain (shuffled) join
    val plain = Tables.lineitem(spark, Sf0001)
      .join(Tables.orders(spark, Sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(sum(col("l_quantity")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === plain)
  }

  test("salted join equals plain join exactly") {
    val l = Tables.lineitem(spark, Sf0001)
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
    val p = Tables.part(spark, Sf0001).select(col("p_partkey"), col("p_brand"))
    val salted = relational.Skew.saltedJoin(l, p, "p_partkey",
      Seq("l_orderkey", "l_linenumber"), salt = 8)
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val plain = l.join(p, "p_partkey")
      .groupBy("p_brand").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted === plain)
  }

  test("hash sampling: exact size, deterministic, partition-independent") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Sampling.hashSample(docs, Seq("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.size === 100)
    val b = Sampling.hashSample(docs.repartition(13), Seq("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "sample changed under repartitioning")
  }

  test("md5 sampling: exact size, partition-independent, xx/md5 differ") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Sampling.hashSampleMd5(docs, Seq("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.size === 100)
    val b = Sampling.hashSampleMd5(docs.repartition(7), Seq("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "md5 sample changed under repartitioning")
    // different rank functions select different (both valid) subsets —
    // guards against one silently delegating to the other
    val xx = Sampling.hashSample(docs, Seq("doc_id"), 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== xx)
  }

  test("quota sampling: every group capped, deterministic under repartition") {
    val docs = Tables.documents(spark, Sf0001)
    val a = Sampling.quotaSample(docs, "lang", Seq("doc_id"), 5)
      .select("doc_id", "lang").collect()
    val perGroup = a.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perGroup.nonEmpty && perGroup.values.forall(_ <= 5), perGroup)
    val b = Sampling.quotaSample(docs.repartition(13), "lang", Seq("doc_id"), 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.map(_.getLong(0)).toSet === b,
      "quota sample changed under repartitioning")
  }

  test("stratified sampling: exact floor(frac*n) per stratum, pre-reduce transparent") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, Sf0001)
    val frac = when(col("lang") === "en", 0.5).otherwise(0.2)
    val out = Sampling.stratifiedSample(docs, "lang", Seq("doc_id"), frac)
      .select("doc_id", "lang").collect()
    val trueN = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = out.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    trueN.foreach { case (l, n) =>
      val f = if (l == "en") 0.5 else 0.2
      assert(got.getOrElse(l, 0) === math.floor(f * n).toInt, s"stratum $l")
    }
    // pre-reduce never changes membership; partitioning never changes it
    val single = Sampling.stratifiedSample(docs.repartition(13), "lang",
        Seq("doc_id"), frac, preSplit = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(0)).toSet === single)
  }

  test("bucketed landing re-lands when the source parquet is rewritten") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory("graft_j6_stale")
    try {
      for (t <- Seq("lineitem.parquet", "orders.parquet"))
        Files.copy(Paths.get(Sf0001, t), tmp.resolve(t))
      val first = relational.Bucketed.preparedNames(spark, tmp.toString)
      // unchanged source → memo hit, same landed tables
      assert(relational.Bucketed.preparedNames(spark, tmp.toString) === first)
      // rewrite the source (bump mtime past filesystem granularity) →
      // fresh landing under new names, not the stale layout
      val li = tmp.resolve("lineitem.parquet")
      Files.setLastModifiedTime(li, java.nio.file.attribute.FileTime
        .fromMillis(li.toFile.lastModified() + 5000))
      val second = relational.Bucketed.preparedNames(spark, tmp.toString)
      assert(second !== first, "stale bucketed landing served after rewrite")
    } finally {
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  test("temperature mix: flattens a skewed source mix to an exact budget") {
    import spark.implicits._
    // isqrt weights: big=60, mid=20, small=10 → W=90. budget=100 →
    // bases 66/22/11 (Σ=99), remainders 60/20/10 → the 1 leftover unit
    // goes to big: targets 67/22/11.
    val corpus = ((1L to 3600L).map(i => ("big", i)) ++
      (1L to 400L).map(i => ("mid", 10000L + i)) ++
      (1L to 100L).map(i => ("small", 20000L + i))).toDF("src", "id")
    val out = Sampling.temperatureMix(corpus, "src", Seq("id"), 100)
      .select("src", "id").collect()
    val got = out.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(got === Map("big" -> 67, "mid" -> 22, "small" -> 11), got)
    // flattening: the dominant source's mix share drops below its corpus
    // share; the small source's share rises above its corpus share
    assert(67.0 / 100 < 3600.0 / 4100 && 11.0 / 100 > 100.0 / 4100)
    // membership is layout-independent
    val b = Sampling.temperatureMix(corpus.repartition(13), "src",
        Seq("id"), 100)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out.map(_.getLong(1)).toSet === b,
      "temperature mix changed under repartitioning")
  }

  test("temperature mix: an exhausted source contributes all it has, " +
      "never up-samples") {
    import spark.implicits._
    val corpus = ((1L to 3600L).map(i => ("big", i)) ++
      (1L to 100L).map(i => ("small", 20000L + i))).toDF("src", "id")
    // isqrt weights 60/10, W=70; budget 2000 → small's raw target
    // 2000·10/70 = 285 > 100 → capped at all 100 rows; the mix comes up
    // short of the budget rather than duplicating rows
    val got = Sampling.temperatureMix(corpus, "src", Seq("id"), 2000)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("small") === 100L, got)
    assert(got.values.sum < 2000L, got)
  }

  test("weighted systematic sampling: exact n, weight-proportional, " +
      "layout- and bucket-invariant") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
    // max(n_chars)=558 < W/n=15315 → no row spans two boundaries → exactly n
    val sel = Sampling.systematicWeighted(docs, "doc_id", "n_chars", 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel.size === 10, sel)
    // membership survives any partitioning and any bucket granularity
    val sel2 = Sampling.systematicWeighted(docs.repartition(13), "doc_id",
        "n_chars", 10, bucketSize = 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel2 === sel, "weighted sample changed under layout/bucket size")
    // a row holding most of the mass is always selected (its interval
    // spans ≥ 1 boundary); zero-weight rows never are (empty interval)
    val f = ((1L to 100L).map(i => (i, if (i == 37L) 100000L else 10L)) :+
      ((101L, 0L))).toDF("id", "w")
    val got = Sampling.systematicWeighted(f, "id", "w", 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(37L) && !got.contains(101L), got)
  }

  test("weighted systematic sampling: three-level prefix matches the " +
      "single-window reference on a many-bucket frame") {
    import spark.implicits._
    // 5000 ids at bucketSize=8 → 625 occupied buckets across 79
    // super-buckets: the rolled-up path with real multi-super fan-in.
    // Weights include zeros (empty intervals must stay unselected).
    val f = (1L to 5000L).map(i => (i, i * 2654435761L % 97L))
      .toDF("id", "w")
    val tot = f.agg(sum(col("w"))).head().getLong(0)
    val wAll = Window.partitionBy(lit(0)).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = f.withColumn("cum", sum(col("w")).over(wAll))
      .filter(expr(s"(cum * 20) div $tot") >
        expr(s"((cum - w) * 20) div $tot"))
      .select("id").collect().map(_.getLong(0)).toSet
    val got = Sampling.systematicWeighted(f, "id", "w", 20, bucketSize = 8)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === ref, "three-level prefix diverged from single-window")
  }

  test("group split: groups are atomic and the split is layout-independent") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf0001)
    val out = Sampling.groupSplit(docs, "source", 80)
      .select("source", "split").collect()
    val perGroup = out.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).distinct).toMap
    assert(perGroup.values.forall(_.length == 1),
      "a source straddles the train/heldout boundary: " + perGroup)
    // a wide synthetic group set exercises both sides of the threshold
    // deterministically (split is a pure function of the group value)
    val many = (1 to 400).map(g => (s"g$g", g.toLong)).toDF("grp", "id")
    val splits = Sampling.groupSplit(many, "grp", 80)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet === Set("train", "heldout"), splits)
    // ~80% quantized to 204/256 — allow generous tolerance on 400 groups
    assert(splits("train") > 280 && splits("train") < 360, splits)
    val again = Sampling.groupSplit(many.repartition(7), "grp", 80)
      .filter(col("split") === "train")
      .select("grp").collect().map(_.getString(0)).toSet
    val first = Sampling.groupSplit(many, "grp", 80)
      .filter(col("split") === "train")
      .select("grp").collect().map(_.getString(0)).toSet
    assert(again === first)
  }

  test("quota sampling: skew pre-reduce bounds the final window's input " +
      "and never changes the result") {
    import spark.implicits._
    // one dominant group (10k rows) — the skew shape the pre-reduce exists
    // for — plus a small group that must pass through untouched
    val skewed = ((1L to 10000L).map(i => ("big", i)) ++
      (1L to 20L).map(i => ("small", 100000L + i))).toDF("grp", "id")
    val quota = 7
    val preSplit = 32
    val reduced = Sampling.quotaPreReduce(skewed, "grp", Seq("id"),
      lit(quota), seed = 42L, preSplit = preSplit)
    val perGroup = reduced.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the dominant group shrinks to ≤ preSplit·quota rows BEFORE the final
    // per-group window — this is the level-1 reduction the skew story claims
    assert(perGroup("big") <= (preSplit * quota).toLong, perGroup)
    assert(perGroup("big") > quota.toLong)   // level 1 alone over-keeps…
    assert(perGroup("small") === 20L)
    // …and the two-level form selects EXACTLY the single-window membership
    val twoLevel = Sampling.quotaSample(skewed, "grp", Seq("id"), quota)
      .select("id").collect().map(_.getLong(0)).toSet
    val oneWindow = Sampling.quotaSample(skewed, "grp", Seq("id"), quota,
        preSplit = 0)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(twoLevel === oneWindow)
  }
}
