package graft

import org.apache.spark.sql.DataFrame

/** Frozen-fixture gate for the approximate ANN paths (round-4 verdict
  * "What's missing" #3): x2/x4/x5 are approximate BY CONTRACT, so no SQL
  * oracle exists — but each is a deterministic function of (data, seed),
  * so its verified top-k freezes as parquet (committed under
  * src/test/resources/fixtures, written once by graft.tools.GenFixtures)
  * and the live pipeline must reproduce it as DATA at sf0.01 AND sf0.1.
  * Any drift — plane seeding, Lloyd fit, probe policy, quantization,
  * rerank tie-breaks — fails this suite even while the recall-floor
  * specs still pass.
  */
class AnnFixtureSpec extends SparkSpec {

  private val FixtureDir = "src/test/resources/fixtures"
  private val Sf01 = "/root/testdata/sf0.1"

  private def assertSame(got: DataFrame, fixturePath: String): Unit = {
    val want = spark.read.parquet(fixturePath)
    assert(want.count() > 0, s"$fixturePath is empty")
    assert(got.columns.sorted.sameElements(want.columns.sorted),
      s"schema drift: ${got.columns.toSeq} vs ${want.columns.toSeq}")
    val missing = want.exceptAll(got).count()
    val extra = got.exceptAll(want).count()
    assert(missing == 0 && extra == 0,
      s"$fixturePath: $missing fixture rows missing, $extra unexpected rows")
  }

  for ((q, short) <- Seq("x2_cosine_topk_lsh" -> "x2",
      "x4_cosine_topk_ivf" -> "x4", "x5_cosine_topk_sq8" -> "x5",
      "x7_knn_join" -> "x7");
      (dir, tag) <- Seq(Sf001 -> "sf0.01", Sf01 -> "sf0.1")) {
    test(s"$short top-k matches the frozen fixture at $tag") {
      assertSame(SparkEntry.queries(q)(spark, dir),
        s"$FixtureDir/${short}_topk_$tag")
    }
  }
}
