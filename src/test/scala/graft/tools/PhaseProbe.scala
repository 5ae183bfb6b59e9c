package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Time a registered query's driver phases separately: analysis,
  * optimization, physical planning, then execution — for localizing
  * data-size-independent per-execution cost.
  * Usage: Test/runMain graft.tools.PhaseProbe <query> [sfDir]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val qs = args(0).split(',').toSeq // comma-separated for batch probing
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val s = SparkSpec.session
    def t[A](q: String, label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $q $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    for (q <- qs; i <- 1 to 2) {
      println(s"[phase] --- $q run $i ---")
      val df = t(q, "build")(SparkEntry.queries(q)(s, dir))
      val qe = df.queryExecution
      t(q, "analyzed")(qe.analyzed)
      t(q, "optimized")(qe.optimizedPlan)
      t(q, "physical")(qe.executedPlan)
      t(q, "collect")(df.collect())
    }
  }
}
