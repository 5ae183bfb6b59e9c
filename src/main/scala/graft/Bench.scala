package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session on the tiny sf0.001 tables — codegen, parquet
    // reader, broadcast machinery, the HOF interpreter, window exec and
    // the custom kernels — so one-time JIT/compile cost isn't attributed
    // to whichever query of that shape happens to run first.
    val warmDir = "/root/testdata/sf0.001"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // One representative per execution shape, t7 included: the round-3
    // bench attributed ~1.2s of one-time JIT for the explode→hash-agg
    // shape to t7_top_tokens itself (0.33s r2 → 1.5-2.1s r3 single-shot;
    // steady-state is 0.51s).
    Seq("t9_array_funcs", "w4_rank_family", "j1_join_broadcast",
      "d3_simhash", "x1_cosine_topk_brute", "t7_top_tokens")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    // Optional args = query names to run (local iteration); no args = all.
    val only = args.toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    // Each query runs SPARK_GRAFT_REPS times (default 3) and reports the
    // MIN (best-of) — single-shot timings on a busy box attributed up to
    // 4x interference to innocent queries in round 3 (d1/w1/p1/s1).
    // External interference only ever ADDS time, so the min is the stable
    // estimator of a query's true cost: in a three-run experiment the
    // medians of two quiet runs agreed to 0.2% on the total but still
    // swung >10% on sub-second queries whenever load landed on 2 of 3
    // reps; a real regression raises the min just the same.
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt)
    // A failing query is reported as -1, never as an ordinary small timing —
    // silent failures would inflate apparent coverage.
    val results = selected.map { case (name, fn) =>
      val timed = try {
        Some((1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        })
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          None
      }
      name -> timed.map(_.min).getOrElse(-1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","reps":$reps}"""
    println(json)
    // Also write the line to a file when asked: pane-scraped stdout
    // truncated the round-4 driver capture to 63 of 90 queries, losing
    // per-query data — a file sidesteps terminal buffering entirely.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { path =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json + "\n")
    }
    spark.stop()
  }
}
