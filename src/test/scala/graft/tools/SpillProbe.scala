package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.SimilarityOps._

/** One-off tuning sweep for [[graft.ext.SimilarityOps.IvfSpillMargin]]:
  * prints x4 aggregate recall and storage expansion for a margin grid at
  * both SFs. The constant is chosen where recall clears the target with
  * expansion ≤ ~1.3×; RecallProbe then re-measures every gated op at the
  * chosen value.
  *
  * Usage: `Test/runMain graft.tools.SpillProbe`
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1"); k <- Seq(4, 8, 16, 0))
      println(f"[d12cov] $dir cells=$k intra-cell coverage: " +
        f"${d12CoverageFrame(s, dir, k).head().getDouble(0)}%.4f")
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = Tables.embeddings(s, dir).cache()
      val q5 = emb.filter(col("vec_id") < 5)
      val exact = bruteForceTopK(emb, q5, 10).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (m <- Seq(0.0, 0.05, 0.10, 0.15, 0.20, 0.30)) {
        val ap = ivfTopK(emb, q5, 10, spillMargin = m)
          .select("q_id", "c_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (exact & ap).size.toDouble / exact.size
        val exp = spillExpansion(emb, m)
        println(f"[sweep] $dir margin=$m%.2f recall=$rec%.4f expansion=$exp%.4f")
      }
      emb.unpersist()
    }
  }
}
