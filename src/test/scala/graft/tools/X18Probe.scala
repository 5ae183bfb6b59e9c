package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.SimilarityOps._

/** Knob sweep for the x18 graph-ANN serve path: prints aggregate recall
  * vs brute force for (beam, hops, entries, degree) grids at both SFs —
  * the measurement behind `X18Floor` and the registered knob choice.
  *
  * Usage: `Test/runMain graft.tools.X18Probe`
  */
object X18Probe {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, dir).cache()
      val q5 = emb.filter(col("vec_id") < 5)
      val exact = bruteForceTopK(emb, q5, 10).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((b, h, e, g) <- Seq(
          (16, 3, 4, 8),   // current registered shape
          (32, 4, 8, 8),
          (32, 6, 8, 8),
          (48, 4, 16, 8),
          (32, 4, 8, 16),
          (48, 6, 16, 16))) {
        val ap = knnGraphBeamTopK(s, dir, q5, 10, beam = b, hops = h,
            nEntries = e, degree = g)
          .select("q_id", "c_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val agg = (exact & ap).size.toDouble / exact.size
        val per = (0L until 5L).map(q =>
          (exact.filter(_._1 == q) & ap).size / 10.0)
        println(f"[x18] $dir b=$b h=$h e=$e g=$g agg=$agg%.3f " +
          s"per-query: ${per.mkString(", ")}")
      }
      emb.unpersist()
    }
  }
}
