package graft.tools

import graft.{PlanChecks, SparkEntry, SparkSpec}

/** One-shot audit: execute every registered query at sf0.001 and report
  * each partition-less WindowExec in the final adaptive plan, with its
  * child node — the round-6 km1 cliff class. Expected hits are ONLY the
  * documented tiny-frame prefix sums (ext.Sampling: one row per source /
  * per bucket — `partitionBy(lit(0))` constant-folds to an empty spec at
  * the exec level); anything whose child is a data-sized scan or exchange
  * is a scale bug.
  *
  * Usage: `Test/runMain graft.tools.WindowAudit`
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    val dir = "/root/testdata/sf0.001"
    var hits = 0
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val bad = PlanChecks.partitionlessWindows(fn(s, dir))
        if (bad.nonEmpty) {
          hits += bad.size
          bad.foreach { w =>
            val child = w.child.getClass.getSimpleName
            println(s"[windowaudit] $name: ${w.windowExpression.map(_.sql).mkString(",").take(80)} over child=$child")
          }
        }
      } catch {
        case e: Throwable =>
          println(s"[windowaudit] $name ERROR ${e.getMessage.take(120)}")
      }
    }
    println(s"[windowaudit] total partition-less WindowExec: $hits")
  }
}
