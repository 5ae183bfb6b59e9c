package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (north-star extension).
  *
  * Scale design: the query set is small and broadcast; the corpus streams
  * through one scan computing per-row similarities (pure higher-order
  * expressions, no UDF), then a per-query top-k window. At 100 TB the scan
  * dominates and parallelizes perfectly; the window shuffles only
  * (n_queries × corpus) candidate rows — pruned first by a similarity
  * threshold. The LSH variant buckets by random hyperplane signs so each
  * query probes ~1/2^bits of the corpus.
  */
object SimilarityOps {

  /** Dot product of two float-array columns, accumulated in double,
    * strictly left-to-right (deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbours for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def x1BruteTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 10)
      .select(col("q_id"), col("rank"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Random-hyperplane LSH: signature = sign bits of dot(v, h_i) for
    * deterministic pseudo-random hyperplanes derived from xxhash64(i, dim).
    * Buckets index the corpus; queries probe their own bucket only.
    * Approximate — spec-tested for recall against brute force.
    */
  def hyperplaneSig(emb: Column, dim: Int, bits: Int): Column = {
    val planes: Seq[Seq[Double]] = (0 until bits).map { b =>
      val rng = new scala.util.Random(42L * (b + 1))
      Seq.fill(dim)(rng.nextGaussian())
    }
    val bitCols = planes.zipWithIndex.map { case (p, i) =>
      val planeArr = array(p.map(lit): _*)
      when(dot(emb, planeArr) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, bits: Int = 8,
      dim: Int = 64): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      hyperplaneSig(col("embedding"), dim, bits).as("bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      hyperplaneSig(col("embedding"), dim, bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), cosine(col("q_emb"), col("c_emb")).as("sim"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  private def x2LshTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    lshTopK(emb, emb.filter(col("vec_id") < 5), 10, bits = 4)
      .select(col("q_id"), col("rank"), col("c_id"), col("sim"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold; at small SF a
    * broadcast self-join, at scale the LSH bucketing bounds candidates.
    */
  private def x3NearDupPairs(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    a.crossJoin(broadcast(b)).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") >= 0.35)
      .orderBy(col("id_a"), col("id_b"))
  }

  val qs: Seq[(String, Q)] = Seq(
    "x1_cosine_topk_brute" -> Q(x1BruteTopK, None),
    "x2_cosine_topk_lsh"   -> Q(x2LshTopK, None),
    "x3_embedding_neardup" -> Q(x3NearDupPairs, None),
  )
}
