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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session on the tiny sf0.001 tables — codegen, parquet
    // reader, broadcast machinery, the HOF interpreter, window exec and
    // the custom kernels — so one-time JIT/compile cost isn't attributed
    // to whichever query of that shape happens to run first.
    val warmDir = "/root/testdata/sf0.001"
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Seq("t9_array_funcs", "w4_rank_family", "j1_join_broadcast",
      "d3_simhash", "x1_cosine_topk_brute")
      .foreach { n =>
        try SparkEntry.queries(n)(spark, warmDir).count()
        catch { case _: Throwable => () }
      }
    // Optional args = query names to run (local iteration); no args = all.
    val only = args.toSet
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    // SPARK_GRAFT_REPS>1 (local iteration only): run each query that many
    // times and report the LAST timing — isolates steady-state cost from
    // JIT/codegen warmup noise. The driver leaves it unset (=1).
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    // A failing query is reported as -1, never as an ordinary small timing —
    // silent failures would inflate apparent coverage.
    val results = selected.map { case (name, fn) =>
      var last = -1.0
      val ok = try {
        (1 to reps).foreach { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          last = (System.nanoTime() - t0) / 1e9
        }
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      name -> (if (ok) last else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => k }
    val total = results.values.filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
