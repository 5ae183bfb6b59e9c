package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Hybrid (sparse + dense) retrieval — the fusion layer of a production
  * search/curation stack: t17's BM25 lexical ranking and the x-family's
  * cosine ranking each nominate a bounded candidate list, and reciprocal
  * rank fusion (RRF, Cormack–Clarke–Büttcher SIGIR 2009) combines them
  * on RANKS alone: score(d) = Σ_lists 1/(60 + rank_list(d)). Rank-based
  * fusion needs no score calibration between retrievers whose scales are
  * incomparable (BM25 is unbounded, cosine is [-1,1]) — which is exactly
  * why it is the default fusion in hybrid search engines.
  *
  * Scale story (SURVEY.md §2-ext): each retriever ends in a top-`CandDepth`
  * (TakeOrderedAndProject — never a global sort), so whatever the corpus
  * size, the fusion input is ≤ 2·CandDepth rows. At 100 TB the candidate
  * generators are the INDEXED paths — an inverted index for BM25 (t17
  * already filters tf to query terms before its only corpus-sized
  * shuffle) and x12's partition-pruned IVF serve for the dense side — and
  * fusion cost stays O(k) regardless; the registered query uses the EXACT
  * dense ranking so the whole result is engine-portable and hash-gated
  * (the approximate dense paths carry their own recall gates x2–x12).
  *
  * Engine parity: both rankings are deterministic cross-engine (BM25
  * ranks over the round-6 scores t17 already hash-matches, doc_id
  * tiebreak; dense ranks over raw cosine doubles, the x1 discipline),
  * and the RRF sum is ≤ 2 IEEE divisions with exact-integer denominators
  * plus one commutative addition — bit-identical in DuckDB.
  */
object RetrievalOps {

  /** Standard RRF smoothing constant (the SIGIR'09 paper's k = 60). */
  private[graft] val RrfK = 60

  /** Per-retriever candidate-list depth. */
  private[graft] val CandDepth = 50

  /** Fused rows emitted. */
  private[graft] val FusedTopK = 20

  /** Exact 1-based dense rank of a ≤`CandDepth`-row candidate list by
    * (score DESC, id ASC) via a triangular self-join — rank = 1 + |rows
    * strictly ahead|. Bounded-input by construction (both callers sit
    * above a top-k), so the ≤n² comparison cost is ≤ CandDepth² and the
    * plan stays free of partition-less WindowExec (the util.Ranks
    * discipline, degenerate-size edition).
    */
  private[graft] def tinyRankDesc(df0: DataFrame, score: String, id: String)
      : DataFrame = {
    // The self-join would otherwise recompute the candidate list's WHOLE
    // lineage (a corpus-sized BM25 scan) once per side — materialize the
    // ≤CandDepth-row list first (eager localCheckpoint: blocks freed by
    // ContextCleaner on GC, no session-lifetime pin).
    val df = df0.localCheckpoint(true)
    df.as("_a")
      .join(df.as("_b"),
        col(s"_b.$score") > col(s"_a.$score") ||
          (col(s"_b.$score") === col(s"_a.$score") &&
            col(s"_b.$id") < col(s"_a.$id")),
        "left")
      .groupBy(col(s"_a.$id").as(id))
      .agg((count(col(s"_b.$id")) + 1).cast("long").as("r"))
  }

  /** Fuse two (doc_id, r) candidate rankings: per-doc RRF contributions
    * union (≤ 2·CandDepth rows), one tiny aggregate reassembles the
    * per-list ranks (0 = absent from that list) and sums the reciprocal
    * ranks. The sum has ≤ 2 terms, so double addition is order-free
    * (IEEE + is commutative); ties across swapped rank pairs
    * ({a,b} vs {b,a} sum identically) break on doc_id.
    */
  private[graft] def rrfFuse(bm: DataFrame, dense: DataFrame): DataFrame = {
    val contribs = bm
      .select(col("doc_id"), col("r"), lit("bm").as("side"))
      .unionByName(dense.select(col("doc_id"), col("r"), lit("dn").as("side")))
    val rrf = sum(lit(1.0) / (lit(RrfK) + col("r")).cast("double"))
    contribs.groupBy(col("doc_id"))
      .agg(
        coalesce(max(when(col("side") === "bm", col("r"))), lit(0L))
          .cast("long").as("r_bm25"),
        coalesce(max(when(col("side") === "dn", col("r"))), lit(0L))
          .cast("long").as("r_dense"),
        rrf.as("_rrf"))
      .orderBy(col("_rrf").desc, col("doc_id"))
      .limit(FusedTopK)
      .select(col("doc_id"), col("r_bm25"), col("r_dense"),
        round(col("_rrf"), 6).as("rrf"))
  }

  /** X13: hybrid search for one query — BM25 over t17's fixed term set,
    * dense = exact cosine against doc 0's embedding (documents and
    * embeddings share the id space), RRF-fused top-20.
    */
  private def x13Hybrid(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val emb = Tables.embeddings(s, d)
    val bm = tinyRankDesc(
      TextOps.bm25Score(docs, TextOps.Bm25Terms, CandDepth)
        .select(col("doc_id"), col("score")),
      "score", "doc_id")
    val dense = SimilarityOps
      .bruteForceTopK(emb, emb.filter(col("vec_id") === 0), CandDepth)
      .select(col("c_id").as("doc_id"), col("rank").cast("long").as("r"))
    rrfFuse(bm, dense).orderBy(col("rrf").desc, col("doc_id"))
  }

  private val x13Sql =
    """WITH tk AS (
      |  SELECT doc_id, tok FROM (
      |    SELECT doc_id, UNNEST(STR_SPLIT(LOWER(text), ' ')) AS tok
      |    FROM documents)
      |  WHERE LENGTH(tok) > 0),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY doc_id),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd,
      |              CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tk
      |  WHERE tok IN ('hash', 'join', 'spark') GROUP BY doc_id, tok),
      |df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
      |wt AS (
      |  SELECT tf.doc_id, tf.tok,
      |    LN(1 + (CAST(nd - df AS DOUBLE) + 0.5)
      |          / (CAST(df AS DOUBLE) + 0.5))
      |      * (CAST(tf AS DOUBLE) * 2.2)
      |      / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |          (CAST(dl.dl AS DOUBLE)
      |            / (CAST(tot AS DOUBLE) / CAST(nd AS DOUBLE))))) AS w
      |  FROM tf JOIN df ON tf.tok = df.tok
      |  JOIN dl ON tf.doc_id = dl.doc_id, st),
      |bm AS (
      |  SELECT doc_id,
      |    ROUND(COALESCE(MAX(CASE WHEN tok = 'hash' THEN w END), 0)
      |        + COALESCE(MAX(CASE WHEN tok = 'join' THEN w END), 0)
      |        + COALESCE(MAX(CASE WHEN tok = 'spark' THEN w END), 0), 6)
      |      AS score
      |  FROM wt GROUP BY doc_id),
      |bmtop AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
      |      AS r
      |  FROM (SELECT * FROM bm ORDER BY score DESC, doc_id LIMIT 50)),
      |q AS (SELECT CAST(embedding AS DOUBLE[]) AS q_emb FROM embeddings
      |      WHERE vec_id = 0),
      |dn AS (
      |  SELECT vec_id AS doc_id,
      |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), q_emb) AS sim
      |  FROM embeddings, q WHERE vec_id <> 0),
      |dntop AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY sim DESC, doc_id) AS BIGINT)
      |      AS r
      |  FROM (SELECT * FROM dn ORDER BY sim DESC, doc_id LIMIT 50)),
      |contrib AS (
      |  SELECT doc_id, r, 'bm' AS side FROM bmtop
      |  UNION ALL SELECT doc_id, r, 'dn' AS side FROM dntop)
      |SELECT doc_id,
      |  CAST(COALESCE(MAX(CASE WHEN side = 'bm' THEN r END), 0) AS BIGINT)
      |    AS r_bm25,
      |  CAST(COALESCE(MAX(CASE WHEN side = 'dn' THEN r END), 0) AS BIGINT)
      |    AS r_dense,
      |  ROUND(SUM(CAST(1.0 AS DOUBLE) / CAST(60 + r AS DOUBLE)), 6) AS rrf
      |FROM contrib GROUP BY doc_id
      |ORDER BY SUM(CAST(1.0 AS DOUBLE) / CAST(60 + r AS DOUBLE)) DESC,
      |  doc_id
      |LIMIT 20""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "x13_hybrid_rrf" -> Q(x13Hybrid, Some(x13Sql)),
  )
}
