package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixture-backed DuckDB oracles for deterministic outputs no SQL can
  * recompute (seeded-xxhash sketches d2/d3, the real-decode mm1
  * features): the expected rows are frozen ONCE from a verified run
  * (graft.tools.GenFixtures) as parquet under
  * `src/test/resources/fixtures/oracle/<query>/`, and the oracle SQL
  * reads them back with `read_parquet`, so the driver's hash compare
  * becomes a hard regression gate on the full output — the same
  * discipline as the committed spec fixtures, made driver-visible (the
  * s1 stroke oracle already proves the driver accepts absolute file
  * paths in oracle SQL).
  *
  * Fixtures for every supported SF live in ONE directory; each row
  * carries a `corpus_key` = Σ n_chars of the documents table it was
  * frozen from, and both sides filter on the CURRENT table's key — a
  * content key, not a row count, because sf0.001 and sf0.01 both hold
  * 500 documents with different text. An unknown SF matches nothing and
  * fails loudly rather than silently passing.
  */
object OracleFixtures {

  /** Absolute so the driver's DuckDB (whatever its cwd) resolves it. */
  val Dir = "/root/repo/src/test/resources/fixtures/oracle"

  /** The discriminating content key of a documents frame. */
  def corpusKey(docs: DataFrame) =
    sum(col("n_chars")).cast("long").as("corpus_key")

  /** Append the current corpus key to every result row (one tiny agg,
    * broadcast onto the result).
    */
  def withCorpusKey(result: DataFrame, docs: DataFrame): DataFrame =
    result.crossJoin(broadcast(docs.agg(corpusKey(docs))))

  /** Oracle text: replay the frozen rows for the current corpus. */
  def sql(query: String, cols: Seq[String], orderBy: String): String =
    s"""SELECT ${cols.mkString(", ")}, corpus_key
       |FROM read_parquet('$Dir/$query/*.parquet')
       |WHERE corpus_key = (SELECT CAST(sum(n_chars) AS BIGINT)
       |                    FROM documents)
       |ORDER BY $orderBy""".stripMargin
}
