package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** End-to-end training-data curation: the composition story. A corpus
  * flows through quality gating → exact dedup → deterministic sampling in
  * ONE declarative plan — Catalyst fuses the quality predicates into the
  * scan, the dedup is a digest groupBy, and the sample is a pushed-down
  * filter. This is the pipeline shape that carves a training subset out
  * of 100 TB in a single pass + one shuffle.
  */
object Curation {

  /** Quality gate: length band + punctuation density cap + token floor. */
  def qualityFilter(docs: DataFrame): DataFrame =
    docs.filter(
      col("n_chars").between(80, 520) &&
        TextOps.tokenCount(col("text")) >= 15 &&
        (TextOps.punctCount(col("text")).cast("double") /
          length(col("text"))) < 0.05)

  private def pipe1Curation(s: SparkSession, d: String): DataFrame = {
    val gated = qualityFilter(Tables.documents(s, d))
    val deduped = gated.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"),
        min(col("lang")).as("lang"),
        min(col("n_chars")).as("n_chars"))
    deduped
      .filter(col("doc_id") % 5 === 0)   // deterministic 1-in-5 sample
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  // min(lang) is deterministic (dedup groups byte-identical texts, whose
  // lang metadata is identical too — min just avoids first()'s ordering
  // dependence).
  private val pipe1Sql =
    """WITH gated AS (
      |  SELECT * FROM documents
      |  WHERE n_chars BETWEEN 80 AND 520
      |    AND LEN(STR_SPLIT(text, ' ')) >= 15
      |    AND CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      |        / LENGTH(text) < 0.05
      |), deduped AS (
      |  SELECT MIN(doc_id) AS doc_id, MIN(lang) AS lang,
      |         MIN(n_chars) AS n_chars
      |  FROM gated GROUP BY text
      |)
      |SELECT doc_id, lang, n_chars FROM deduped
      |WHERE doc_id % 5 = 0 ORDER BY doc_id""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "pipe1_curation" -> Q(pipe1Curation, Some(pipe1Sql)),
  )
}
