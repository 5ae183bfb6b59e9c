package graft.balance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SparkEntry registrations for class balancing (SMOTE / k-NN), exercised
  * on the embeddings table (label as class, embedding as features —
  * FIXTURES.md §B). The synthesized feature VALUES are RNG-driven
  * (property-tested in SmoteSpec), but the registered outputs are
  * deterministic — class counts (b1) and neighbour counts + nearest
  * distance (b2) — so both carry DuckDB oracles.
  */
object BalanceQueries {

  private def features(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("features"),
        when(col("label") === 0, lit(0)).otherwise(lit(1)).as("cls"))

  /** B1: SMOTE balance — minority cls=0 oversampled 200%, majority kept.
    * Output: per-class counts before/after.
    */
  private def b1Smote(s: SparkSession, d: String): DataFrame = {
    val df = features(s, d)
    val before = df.groupBy(col("cls")).agg(count(lit(1)).as("n_before"))
    val balanced = Smote.balance(s, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100))
    val after = balanced.groupBy(col("cls")).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("cls"), "outer").orderBy(col("cls"))
  }

  /** Oracle of the SMOTE count contract: percentOver=200 ⇒ 2 synthetic
    * rows per minority row (3× total); percentUnder=100 keeps the whole
    * majority. The RNG only decides feature values, never row counts.
    */
  private val b1Sql =
    """SELECT cls, CAST(count(*) AS BIGINT) AS n_before,
      |  CAST(count(*) * CASE WHEN cls = 0 THEN 3 ELSE 1 END AS BIGINT) AS n_after
      |FROM (SELECT CASE WHEN label = 0 THEN 0 ELSE 1 END AS cls FROM embeddings)
      |GROUP BY cls ORDER BY cls""".stripMargin

  /** B2: exact k-NN over the minority class — neighbour count plus the
    * distance to the nearest neighbour (neighbors are ordered nearest
    * first), rounded 6 dp for bit-exact oracle parity with DuckDB
    * list_distance.
    */
  private def b2Knn(s: SparkSession, d: String): DataFrame = {
    val minority = features(s, d).filter(col("cls") === 0)
    minority.join(Knn.exactNeighbors(minority, "vec_id", "features", 5), "vec_id")
      .select(col("vec_id"), size(col("neighbors")).as("n_neighbors"),
        round(sqrt(Smote.sqDist(col("features"), element_at(col("neighbors"), 1))), 6)
          .as("nn_dist"))
      .orderBy(col("vec_id"))
  }

  private val b2Sql =
    """WITH m AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings WHERE label = 0)
      |SELECT a.vec_id,
      |  CAST(least(5, (SELECT count(*) FROM m) - 1) AS INT) AS n_neighbors,
      |  round(min(list_distance(a.emb, b.emb)), 6) AS nn_dist
      |FROM m a JOIN m b ON a.vec_id <> b.vec_id
      |GROUP BY a.vec_id ORDER BY a.vec_id""".stripMargin

  /** B3: the SMOTE 100 TB scale path — identical recipe to b1 but k-NN
    * through [[Knn.approxNeighbors]] (BucketedRandomProjectionLSH):
    * candidate pairs only from shared buckets, near-linear in minority
    * rows where b1's exact path is O(n²). The oracle is the SAME
    * deterministic count contract as b1 (the RNG and the LSH recall
    * decide feature VALUES and which neighbour is interpolated toward,
    * never row counts — neighbourless rows fall back to
    * self-duplication, see Smote.synthesize).
    */
  private def b3SmoteLsh(s: SparkSession, d: String): DataFrame = {
    val df = features(s, d)
    val before = df.groupBy(col("cls")).agg(count(lit(1)).as("n_before"))
    val balanced = Smote.balance(s, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100),
      Smote.LshKnn(bucketLength = 2.0, numHashTables = 3))
    val after = balanced.groupBy(col("cls")).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq("cls"), "outer").orderBy(col("cls"))
  }

  val qs: Seq[(String, Q)] = Seq(
    "b1_smote_balance" -> Q(b1Smote, Some(b1Sql)),
    "b2_knn_exact"     -> Q(b2Knn, Some(b2Sql)),
    "b3_smote_lsh"     -> Q(b3SmoteLsh, Some(b1Sql)),
  )
}
