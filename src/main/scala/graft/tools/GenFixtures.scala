package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{SparkEntry, Tables}
import graft.ext.{DedupOps, MultimodalOps}

/** One-shot generator for the frozen test fixtures under
  * `src/test/resources/fixtures` — the hard gates for outputs DuckDB
  * cannot oracle (seeded-xxhash sketches d2/d3, approximate ANN top-k
  * x2/x4/x5, the real-decode mm1 features).
  *
  * Freezing discipline: a fixture is generated ONCE from a verified
  * implementation and committed; regeneration is only legitimate after an
  * intentional, reviewed semantic change (git history is the freeze).
  * Existing fixtures are therefore NOT overwritten unless `--force` is
  * passed.
  *
  * Usage (sbt): `runMain graft.tools.GenFixtures [--force]`
  */
object GenFixtures {
  private val OutBase = "src/test/resources/fixtures"

  def main(args: Array[String]): Unit = {
    val force = args.contains("--force")
    // mirror SparkSpec's session shape — fixtures are consumed there
    // (the outputs are partitioning-independent, but identical configs
    // remove a variable)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(name: String)(df: => DataFrame): Unit = {
      val path = Paths.get(OutBase, name)
      if (Files.exists(path) && !force) {
        println(s"[genfixtures] keep   $name (exists; --force to regenerate)")
      } else {
        df.coalesce(1).write.mode("overwrite").parquet(path.toString)
        println(s"[genfixtures] wrote  $name")
      }
    }

    for ((dir, tag) <- Seq("/root/testdata/sf0.01" -> "sf0.01",
        "/root/testdata/sf0.1" -> "sf0.1")) {
      // d2/d3: same call shapes as SketchFixtureSpec
      write(s"d2_pairs_$tag") {
        DedupOps.minhashPairs(Tables.documents(spark, dir))
      }
      write(s"d3_simhash_$tag") {
        DedupOps.simhashTable(Tables.documents(spark, dir))
      }
      // ANN raw top-k builders: frozen as data (AnnFixtureSpec). The
      // registered queries wrap these in bounded recall gates, so the
      // fixtures pin the builders directly.
      for ((short, build) <- Seq(
          "x2" -> (graft.ext.SimilarityOps.x2LshTopK _),
          "x4" -> (graft.ext.SimilarityOps.x4IvfTopK _),
          "x5" -> (graft.ext.SimilarityOps.x5Sq8TopK _),
          "x7" -> (graft.ext.SimilarityOps.x7KnnJoin _),
          "x8" -> (graft.ext.SimilarityOps.x8IvfSq8TopK _),
          "x9" -> (graft.ext.SimilarityOps.x9PqTopK _),
          "x18" -> (graft.ext.SimilarityOps.x18BeamTopK _),
          "x19" -> (graft.ext.SimilarityOps.x19HnswTopK _),
          "x21" -> (graft.ext.SimilarityOps.x21Sq8TopK _),
          "x22" -> (graft.ext.SimilarityOps.x22FilteredTopK _)))
        write(s"${short}_topk_$tag") { build(spark, dir) }
    }
    // mm1: real-decode features over synthesized media (MultimodalSpec),
    // frozen at BOTH SFs like the sketch/ANN fixtures
    for ((dir, tag) <- Seq("/root/testdata/sf0.01" -> "sf0.01",
        "/root/testdata/sf0.1" -> "sf0.1"))
      write(s"mm1_$tag") {
        MultimodalOps.extractFeatures(spark,
            MultimodalOps.synthesizeMedia(Tables.documents(spark, dir)))
          .select(col("doc_id"), col("media_type"), col("n_bytes"),
            col("features"))
      }
    // Fixture-replay ORACLE tables (graft.util.OracleFixtures): the
    // registered query output — corpus_key column included — frozen at
    // both SFs into one directory the DuckDB oracle reads back with
    // read_parquet and filters by the current corpus key.
    // sf0.001 included since the 2026-08-19 regen: its document corpus is
    // no longer byte-identical to sf0.01's, so it needs its own corpus_key
    // rows in the replay table.
    for (name <- Seq("d2_minhash_pairs", "d3_simhash", "mm1_media_features",
        "mm3_resize", "mm4_phash_neardup", "mm5_audio_neardup",
        "t19_bpe_merges", "mm6_scene_cuts"))
      write(s"oracle/$name") {
        Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
            "/root/testdata/sf0.1")
          .map(SparkEntry.queries(name)(spark, _))
          .reduce(_ unionByName _)
      }
    spark.stop()
  }
}
