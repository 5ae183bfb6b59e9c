package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Time a registered query's driver phases separately: analysis,
  * optimization, physical planning, then execution — for localizing
  * data-size-independent per-execution cost.
  * Usage: Test/runMain graft.tools.PhaseProbe <query> [sfDir]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val s = SparkSpec.session
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    for (i <- 1 to 2) {
      println(s"[phase] --- run $i ---")
      val df = t("build")(SparkEntry.queries(q)(s, dir))
      val qe = df.queryExecution
      t("analyzed")(qe.analyzed)
      t("optimized")(qe.optimizedPlan)
      t("physical")(qe.executedPlan)
      t("collect")(df.collect())
    }
  }
}
