package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Print the formatted physical plan of registered queries — the
  * `.explain("formatted")` loop the working notes prescribe after every
  * operator change, runnable against any SF dir without editing code.
  *
  * Usage: `Test/runMain graft.tools.Explain <query...> [-- <sfDir>]`
  * (default sfDir sf0.01; plans are shape-identical across SFs except
  * for AQE's runtime join picks, which is why the default is the
  * CORRECTNESS-gate SF).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (names, rest) = args.span(_ != "--")
    val dir = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val s = SparkSpec.session
    for (n <- names) SparkEntry.queries.get(n) match {
      case None => println(s"[explain] unknown query: $n")
      case Some(fn) =>
        println(s"========== $n ==========")
        val df = fn(s, dir)
        df.explain("formatted")
        // also surface the ADAPTIVE final plan (exchanges AQE removed or
        // converted don't show in the static explain)
        df.collect()
        println("---- adaptive final ----")
        println(df.queryExecution.executedPlan.toString.take(8000))
    }
  }
}
