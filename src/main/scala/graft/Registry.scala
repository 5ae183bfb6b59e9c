package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against. Non-SQL ops (sampling, ML, LSH) leave
  * `sql = None` and are covered by ScalaTest specs instead.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None)

object Registry {
  /** Ordered map so Verify/Bench output is stable across runs. */
  def all: Seq[(String, Q)] =
    relational.CoreOps.qs ++
      relational.WindowOps.qs ++
      relational.SetAndSubqueryOps.qs ++
      relational.TypedOps.qs ++
      relational.Skew.qs ++
      relational.AsOfJoin.qs ++
      relational.RangeJoin.qs ++
      relational.Bucketed.qs ++
      relational.BloomJoin.qs ++
      relational.Scd.qs ++
      sources.JsonAndSinks.qs ++
      sources.SortedLanding.qs ++
      sources.ZOrderLanding.qs ++
      sources.IncrementalRollup.qs ++
      sources.Compaction.qs ++
      sources.Snapshots.qs ++
      sources.ManifestTree.qs ++
      sources.Branches.qs ++
      sources.TimeTravel.qs ++
      sources.FileStats.qs ++
      sources.TxnPair.qs ++
      sources.DeletionVectors.qs ++
      sources.TxnDeletes.qs ++
      sources.SchemaStats.qs ++
      sources.ColumnIds.qs ++
      sources.SortedCompaction.qs ++
      sources.ZOrderCompaction.qs ++
      sources.PartitionEvolution.qs ++
      sources.WriteAuditPublish.qs ++
      ext.Sampling.qs ++
      profile.Profiling.qs ++
      profile.QualityAudit.qs ++
      ext.TextOps.qs ++
      ext.DedupOps.qs ++
      ext.SimilarityOps.qs ++
      ext.RetrievalOps.qs ++
      ext.EventOps.qs ++
      ext.Curation.qs ++
      mining.MiningOps.qs ++
      pipeline.StrokeQueries.qs ++
      ext.MultimodalOps.qs ++
      balance.BalanceQueries.qs ++
      model.ModelQueries.qs ++
      model.Experiments.qs ++
      streaming.StreamQueries.qs ++
      streaming.StreamMerge.qs ++
      streaming.ChangeFeedStream.qs
}
