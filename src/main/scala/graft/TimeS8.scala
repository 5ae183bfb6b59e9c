package graft

import org.apache.spark.sql.SparkSession

// Temporary profiling harness (deleted pre-commit): times named registered
// queries. Usage: runMain graft.TimeS8 <sfDir> <query> [query...]
object TimeS8 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sfDir = args.head
    // warm up
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.tail.foreach { q =>
      time(q)(println(s"  rows=${SparkEntry.queries(q)(spark, sfDir).count()}"))
    }
    spark.stop()
  }
}
