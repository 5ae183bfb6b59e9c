package graft.balance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** SparkEntry registrations for class balancing (SMOTE / k-NN), exercised
  * on the embeddings table (label as class, embedding as features —
  * FIXTURES.md §B). No SQL oracle (RNG + distributed synthesis); invariants
  * are property-tested in SmoteSpec.
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

  /** B2: exact k-NN neighbour lists over the minority class. */
  private def b2Knn(s: SparkSession, d: String): DataFrame = {
    val minority = features(s, d).filter(col("cls") === 0)
    Knn.exactNeighbors(minority, "vec_id", "features", 5)
      .select(col("vec_id"), size(col("neighbors")).as("n_neighbors"))
      .orderBy(col("vec_id"))
  }

  val qs: Seq[(String, Q)] = Seq(
    "b1_smote_balance" -> Q(b1Smote, None),
    "b2_knn_exact"     -> Q(b2Knn, None),
  )
}
