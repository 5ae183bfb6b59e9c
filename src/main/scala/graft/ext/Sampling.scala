package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deterministic uniform sampling for training-data pipelines.
  *
  * `sample(fraction)` gives a *fraction*, varies per run with
  * partitioning, and can't hit an exact target size. Hash-rank sampling
  * takes the global top-n by a seeded hash of the row key: exact size,
  * uniform over keys, identical on every run and every cluster layout,
  * and it plans as TakeOrderedAndProject (per-partition top-n + merge) —
  * no global sort, no collect. This is how you carve a reproducible 1B-doc
  * training subset out of a 100 TB corpus.
  */
object Sampling {

  def hashSample(df: DataFrame, keyCols: Seq[String], n: Int,
      seed: Long = 42L): DataFrame = {
    val rank = xxhash64((keyCols.map(col) :+ lit(seed)): _*)
    df.withColumn("_rank", rank)
      .orderBy((col("_rank") +: keyCols.map(col)): _*)
      .limit(n)
      .drop("_rank")
  }

  /** M3: deterministic 100-doc sample of the corpus. */
  private def m3HashSample(s: SparkSession, d: String): DataFrame =
    hashSample(Tables.documents(s, d), Seq("doc_id"), 100)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  val qs: Seq[(String, Q)] = Seq(
    "m3_hash_sample" -> Q(m3HashSample, None),
  )
}
