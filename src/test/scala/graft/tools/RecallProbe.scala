package graft.tools

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.ext.SimilarityOps._

/** Measurement harness for the ANN bounded-gate floors: prints per-query
  * recall vs in-engine brute force for x2/x4/x5 and aggregate recall for
  * x7, at sf0.01 and sf0.1. Run when (re)setting the recall floors the
  * registered gate queries assert — the floors must sit below every value
  * printed here at BOTH SFs (the pipelines are deterministic, so any
  * floor under the measured minimum is a hard, non-flaky gate).
  *
  * Usage: `Test/runMain graft.tools.RecallProbe`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSpec.session
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    for (dir <- dirs) {
      val emb = Tables.embeddings(s, dir).cache()
      val q5 = emb.filter(col("vec_id") < 5)
      val exact = bruteForceTopK(emb, q5, 10).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nm, df) <- Seq(
          "x2" -> lshTopK(emb, q5, 10, bits = 4,
            probeFlips = graft.ext.SimilarityOps.X2ProbeFlips),
          "x4" -> ivfTopK(emb, q5, 10),
          "x5" -> sq8TopK(emb, q5, 10),
          "x8" -> ivfSq8TopK(emb, q5, 10),
          "x9" -> pqTopK(emb, q5, 10),
          "x11" -> ivfTopKIncremental(emb.filter(col("vec_id") % 10 =!= 0),
            emb.filter(col("vec_id") % 10 === 0), q5, 10),
          "x11b" -> ivfAppendedTopK(s, dir, q5, 10),
          "x12" -> ivfPersistedTopK(s, dir, q5, 10),
          "x15" -> ivfCompactedTopK(s, dir, q5, 10),
          "x16" -> ivfPqPersistedTopK(s, dir, q5, 10),
          "x18" -> knnGraphBeamTopK(s, dir, q5, 10),
          "x18b" -> beamSearchGraph(s, x18bDir(s, dir), q5, 10),
          "x19" -> hnswTopK(s, dir, q5, 10),
          "x20" -> beamSearchGraph(s, x20CompactDir(s, dir), q5, 10),
          "x21" -> graphSq8TopK(s, dir, q5, 10),
          "e26" -> beamSearchGraph(s, e26LayoutDir(s, dir), q5, 10))) {
        val ap = df.select("q_id", "c_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val per = (0L until 5L).map(q =>
          (exact.filter(_._1 == q) & ap).size / 10.0)
        println(s"[recall] $dir $nm per-query: ${per.mkString(", ")}")
      }
      // x10b: filtered search through the IVF index vs exact filtered
      val exF = filteredBruteTopK(emb, q5, 10).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val apF = ivfTopK(emb, q5, 10, matchLabel = true).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] $dir x10b aggregate: ${(exF & apF).size.toDouble / exF.size}%.4f" +
        s" per-query: ${(0L until 5L).map(q => (exF.filter(_._1 == q) & apF).size.toDouble / math.max(1, exF.count(_._1 == q))).mkString(", ")}")
      // x22: filtered search on the graph index vs the same exact filtered
      val apG = graphFilteredTopK(s, dir, q5, 10).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] $dir x22 aggregate: ${(exF & apG).size.toDouble / exF.size}%.4f" +
        s" per-query: ${(0L until 5L).map(q => (exF.filter(_._1 == q) & apG).size.toDouble / math.max(1, exF.count(_._1 == q))).mkString(", ")}")
      val exall = bruteForceTopK(emb, emb, 3).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val kj = knnJoin(emb, 3).select("q_id", "c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[recall] $dir x7 aggregate: ${(exall & kj).size.toDouble / exall.size}%.4f")
      // x13b: indexed-fused doc-set overlap vs the exact-fused top-20
      val exFused = graft.ext.RetrievalOps.x13Hybrid(s, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val idxFused = graft.ext.RetrievalOps.x13bIndexedFused(s, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      println(f"[recall] $dir x13b fused overlap: ${
        (exFused & idxFused).size.toDouble / exFused.size}%.4f")
      println(f"[spill] $dir storage expansion: ${spillExpansion(emb)}%.4f")
      println(f"[d12] $dir intra-cell coverage: ${d12CoverageFrame(s, dir).head().getDouble(0)}%.4f")
      emb.unpersist()
    }
  }
}
