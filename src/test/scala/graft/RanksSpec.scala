package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Ranks

/** Pins util.Ranks — the distributed replacement for global-order windows
  * (t14's ntile, km1's seed positions): the band-parallel rank must be
  * bit-identical to the single-partition row_number it replaces, including
  * score ties and composite tie-break order, and its own plan must hold no
  * partition-less WindowExec (the prefix sum runs as a triangular join).
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // scores with heavy ties across band boundaries; ids shuffled
  private def frame = (1 to 997).map { i =>
    (i.toLong, (i * 7919 % 50).toLong, (i * 31 % 13).toLong)
  }.toDF("id", "score", "tie").repartition(7)

  test("distributedRank equals the global row_number window (with ties)") {
    val got = Ranks.distributedRank(frame, "score", "id", "rn")
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = frame.withColumn("rn", row_number().over(
        Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("tieCols order matches the composite (score, tie, id) window") {
    val got = Ranks.distributedRank(frame, "score", "id", "rn",
        tieCols = Seq("tie"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = frame.withColumn("rn", row_number().over(
        Window.orderBy(col("score"), col("tie"), col("id"))).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("ntileFromRank equals NTILE(10) over the same order") {
    val n = frame.count()
    val got = Ranks.distributedRank(frame, "score", "id", "rn")
      .withColumn("_n", lit(n))
      .withColumn("b", Ranks.ntileFromRank("rn", "_n", 10))
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = frame.withColumn("b", ntile(10).over(
        Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "b").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("distributedRank's own plan holds no partition-less WindowExec") {
    assert(PlanChecks.partitionlessWindows(
      Ranks.distributedRank(frame, "score", "id", "rn")).isEmpty)
  }
}
