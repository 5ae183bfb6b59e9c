package graft.tools

import org.apache.spark.ml.classification.LinearSVC

/** Scratch parity check for the s8 golden literals while tuning the fit
  * layout: prints the registered s8 rows (rounded metrics) — compare to
  * the VALUES in Experiments.s8Sql — plus an SVC fit breakdown.
  * Usage: `Test/runMain graft.tools.S8Check`
  */
object S8Check {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkSpec.session
    val prepared =
      graft.pipeline.StrokePipeline.prepare(s, graft.pipeline.StrokePipeline.RawCsv)
    val (train, test) = graft.model.Classifiers.split7030(prepared, 42L)
    train.count(); test.count()
    // warm JIT with one throwaway fit, then measure
    new LinearSVC().setLabelCol("stroke").fit(train)
    val t1 = System.nanoTime()
    val m = new LinearSVC().setLabelCol("stroke").fit(train)
    val t2 = System.nanoTime()
    val pred = m.transform(test)
    val auc = graft.model.Classifiers.evaluator("stroke").evaluate(pred)
    val t3 = System.nanoTime()
    println(f"[s8check] svc fit ${(t2 - t1) / 1e9}%.2f s " +
      f"(${m.summary.objectiveHistory.length} objective steps), " +
      f"score+auc ${(t3 - t2) / 1e9}%.2f s, auc $auc%.4f")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("s8_experiment_matrix")(s, "/root/testdata/sf0.01")
      .show(20, false)
    println(f"[s8check] wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
  }
}
