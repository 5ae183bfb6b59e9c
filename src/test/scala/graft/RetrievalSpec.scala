package graft

import org.apache.spark.sql.functions._
import graft.ext.{RetrievalOps, SimilarityOps, TextOps}

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("tinyRankDesc: row_number semantics — score desc, ties broken by id") {
    val df = Seq((10L, 0.5), (11L, 0.9), (12L, 0.5), (13L, 0.1))
      .toDF("doc_id", "score")
    val got = RetrievalOps.tinyRankDesc(df, "score", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(11L -> 1L, 10L -> 2L, 12L -> 3L, 13L -> 4L))
  }

  test("rrfFuse: hand-computed reciprocal-rank fusion, absent side = 0") {
    val bm = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "r")
    val dn = Seq((2L, 1L), (3L, 2L)).toDF("doc_id", "r")
    val rows = RetrievalOps.rrfFuse(bm, dn).collect()
    // doc 2 is in both lists (1/62 + 1/61) and must outrank the singles
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 1L, 3L))
    val byId = rows.map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(byId(2L) === ((2L, 1L,
      BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(byId(1L) === ((1L, 0L,
      BigDecimal(1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(byId(3L) === ((0L, 2L,
      BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("x13: fused ranks agree with the standalone BM25 and dense rankings") {
    val out = SparkEntry.queries("x13_hybrid_rrf")(spark, Sf0001).collect()
    assert(out.length === RetrievalOps.FusedTopK)
    // rrf non-increasing in emitted order; doc_id ascending within ties
    val rrfs = out.map(_.getDouble(3))
    assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a >= b })
    // recompute both candidate rankings independently and check every
    // emitted (r_bm25, r_dense, rrf) triple against them
    val docs = Tables.documents(spark, Sf0001)
    val emb = Tables.embeddings(spark, Sf0001)
    val bmRank = TextOps
      .bm25Score(docs, TextOps.Bm25Terms, RetrievalOps.CandDepth)
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val dnRank = SimilarityOps
      .bruteForceTopK(emb, emb.filter(col("vec_id") === 0),
        RetrievalOps.CandDepth)
      .select(col("c_id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    out.foreach { r =>
      val (id, rb, rd, rrf) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rb === bmRank.getOrElse(id, 0L), s"bm rank of $id")
      assert(rd === dnRank.getOrElse(id, 0L), s"dense rank of $id")
      val expect = (if (rb > 0) 1.0 / (RetrievalOps.RrfK + rb) else 0.0) +
        (if (rd > 0) 1.0 / (RetrievalOps.RrfK + rd) else 0.0)
      assert(rrf === BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"rrf of $id")
      assert(rb > 0 || rd > 0, s"$id in fused output but in neither list")
    }
    // a doc present in BOTH lists at best ranks must beat every
    // single-list doc whose one rank is not better than both
    val both = out.filter(r => r.getLong(1) > 0 && r.getLong(2) > 0)
    assert(both.nonEmpty, "fusion never saw a doc in both lists")
  }

  test("x13b: indexed fusion emits a full top-20 whose BM25-side ranks " +
      "are bit-identical to the exact fusion's") {
    val idx = RetrievalOps.x13bIndexedFused(spark, Sf0001).collect()
    assert(idx.length === RetrievalOps.FusedTopK)
    // the sparse side serves from t18's index with bit-identical scores,
    // so every doc the indexed fusion ranks on BM25 must carry the SAME
    // r_bm25 the exact fusion assigns it — only the dense ranks may move
    val exact = RetrievalOps.x13Hybrid(spark, Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    idx.foreach { r =>
      val (id, rb) = (r.getLong(0), r.getLong(1))
      exact.get(id).foreach(erb =>
        assert(rb === erb, s"bm25 rank of $id moved under the index"))
    }
    // and the gate row holds the exact payload with the flag up
    val g = SparkEntry.queries("x13b_hybrid_indexed")(spark, Sf0001).head()
    assert(g.getLong(0) === RetrievalOps.FusedTopK.toLong)
    assert(g.getBoolean(2), "overlap flag must hold at sf0.001")
  }

  // ---- x14 MMR ----

  test("mmrRerank demotes a near-duplicate below a diverse candidate") {
    // query 0 = x-axis; 1 and 2 are IDENTICAL (rel 0.9, pair sim 1.0);
    // 3 is less relevant (0.75) but diverse (sim to 1 ≈ 0.387).
    // Step 2 scores: dup 2 → .7·.9 − .3·1 = .33; diverse 3 →
    // .7·.75 − .3·.387 ≈ .409 → MMR picks 3 before 2.
    val emb = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.43589f, 0f)),
      (2L, Array(0.9f, 0.43589f, 0f)),
      (3L, Array(0.75f, -0.6614f, 0f)),
    ).toDF("vec_id", "embedding")
    val rows = RetrievalOps.mmrRerank(emb, queryId = 0L, depth = 10, k = 10)
      .collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(1L, 3L, 2L))
    // greedy marginal scores are non-increasing (diversity penalty only
    // grows as the selected set grows)
    val scores = rows.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // first pick is pure λ·rel of the top-relevance candidate
    assert(rows.head.getDouble(3) ===
      RetrievalOps.MmrLambda * rows.head.getDouble(2))
  }

  test("mmrRerank caps output at k and never repeats a pick") {
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.8f, 0.3f)),
      (3L, Array(0.5f, 0.5f)), (4L, Array(0.1f, 0.9f)),
    ).toDF("vec_id", "embedding")
    val rows = RetrievalOps.mmrRerank(emb, queryId = 0L, depth = 10, k = 2)
      .collect()
    assert(rows.length === 2)
    assert(rows.map(_.getLong(1)).distinct.length === 2)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }
}
