package graft

import org.apache.spark.sql.functions._
import graft.balance.{Knn, Smote}

/** SMOTE invariants (SURVEY.md §5.2-1):
  *  - synthetic count = n_minority * (percentOver/100)
  *  - every synthetic feature lies within [min, max] of (source, neighbor)
  *    — guaranteed per-dimension by linear interpolation with gap∈[0,1)
  *  - labels always minority; majority under-sample bounded
  *  - k-NN exact results agree with a brute-force reimplementation
  */
class SmoteSpec extends SparkSpec {

  test("b4: a mutual opposite-class 1-NN pair IS a Tomek link; " +
      "same-class mutual and one-directional pairs are not") {
    import spark.implicits._
    // (1,2): isolated tight OPPOSITE-class pair -> link
    // (3,4): tight SAME-class pair -> mutual but no link
    // 5: minority whose 1-NN is 4, but 4's 1-NN is 3 -> one-directional
    val f = Seq(
      (1L, Array(0.0, 0.0), 0), (2L, Array(0.1, 0.0), 1),
      (3L, Array(10.0, 0.0), 1), (4L, Array(10.1, 0.0), 1),
      (5L, Array(10.4, 0.0), 0),
    ).toDF("vec_id", "features", "cls")
    val out = balance.BalanceQueries.tomekLinks(f).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 0.1)))
  }

  private def embFeatures = Tables.embeddings(spark, Sf0001)
    .select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("features"),
      when(col("label") === 0, lit(0)).otherwise(lit(1)).as("cls"))
    .cache()

  test("synthesize: count and label invariants") {
    val df = embFeatures
    val minority = df.filter(col("cls") === 0)
    val nMin = minority.count()
    val synth = Smote.synthesize(spark, minority, "vec_id", "features", "cls",
      Smote.Params(k = 5, percentOver = 300, percentUnder = 100))
    assert(synth.count() === nMin * 3)
    assert(synth.filter(col("cls") =!= 0).count() === 0)
  }

  test("synthesize: interpolation stays within the minority bounding box") {
    val df = embFeatures
    val minority = df.filter(col("cls") === 0)
    val synth = Smote.synthesize(spark, minority, "vec_id", "features", "cls",
      Smote.Params(k = 3, percentOver = 100, percentUnder = 100))
    // Per-dimension global [min,max] of the minority class bounds any
    // point on a segment between two minority points.
    val bounds = minority
      .select(posexplode(col("features")).as(Seq("dim", "v")))
      .groupBy("dim").agg(min("v").as("lo"), max("v").as("hi"))
    val violations = synth
      .select(posexplode(col("features")).as(Seq("dim", "v")))
      .join(bounds, "dim")
      .filter(col("v") < col("lo") - 1e-9 || col("v") > col("hi") + 1e-9)
      .count()
    assert(violations === 0)
  }

  test("balance: class ratio moves toward 1:1 and is deterministic") {
    val df = embFeatures
    val balanced = Smote.balance(spark, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100))
    val counts = balanced.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = df.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) === before(0) * 3)          // minority + 2 synth each
    assert(counts(1) === before(1))              // percentUnder=100 keeps all
    // deterministic across runs
    val again = Smote.balance(spark, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100))
      .groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(again === counts)
  }

  test("exact k-NN matches brute force on a small sample") {
    val minority = embFeatures.filter(col("cls") === 0).limit(30).cache()
    val got = Knn.exactNeighbors(minority, "vec_id", "features", 3)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toVector)).toMap

    val local = minority.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toVector)
    def d2(a: Vector[Double], b: Vector[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    local.foreach { case (id, f) =>
      val expect = local.filter(_._1 != id)
        .sortBy { case (oid, of) => (d2(f, of), oid) }
        .take(3).map(_._2)
      assert(got(id) === expect.toSeq, s"neighbors of $id")
    }
  }

  test("approx k-NN (LSH): degenerate bucket equals exact; real bucket has recall") {
    val minority = embFeatures.filter(col("cls") === 0).limit(40).cache()
    def neighborSets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        r.getSeq[scala.collection.Seq[Double]](1).map(_.toVector).toSet).toMap
    val exact = neighborSets(
      Knn.exactNeighbors(minority, "vec_id", "features", 3))
    def recallAt(bucketLength: Double): Double = {
      val approx = neighborSets(Knn.approxNeighbors(spark, minority,
        "vec_id", "features", 3, bucketLength = bucketLength))
      val hits = exact.keys.toSeq.map { id =>
        (exact(id) & approx.getOrElse(id, Set.empty)).size.toDouble /
          exact(id).size
      }
      hits.sum / hits.size
    }
    // bucketLength ≫ data diameter still splits by projection SIGN
    // (floor(±ε/L) is 0 or −1), so candidates aren't complete — but with
    // 3 OR-ed tables only ~(1/2)³ of true pairs can miss every table:
    // recall must be near-complete. Realistic bucketing must beat chance.
    assert(recallAt(1e6) > 0.8, "near-complete candidate set expected")
    assert(recallAt(4.0) > 0.3, "LSH k-NN recall too low")
  }

  test("SMOTE balances the stroke dataset (ML17 on the reference's data)") {
    import org.apache.spark.ml.functions.vector_to_array
    val prepared = graft.pipeline.StrokePipeline
      .prepare(spark, graft.pipeline.StrokePipeline.RawCsv)
      .select(monotonically_increasing_id().as("rid"),
        vector_to_array(col("features")).as("f"),
        col("stroke"))
    // reference intent (stroke_predict.py:116-122, commented out):
    // SMOTE(k=2, over=400, under=100) on the minority stroke=1 class
    val balanced = Smote.balance(spark, prepared, "rid", "f", "stroke",
      lit(1), Smote.Params(k = 2, percentOver = 400, percentUnder = 100))
    val counts = balanced.groupBy("stroke").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(1) === 249L * 5)   // minority + 4 synthetic each
    assert(counts(0) === 4861L)
  }

  test("synthetic rows carry fresh ids, unique across the balanced output") {
    val df = embFeatures
    val minority = df.filter(col("cls") === 0)
    val synth = Smote.synthesize(spark, minority, "vec_id", "features", "cls",
      Smote.Params(k = 3, percentOver = 200, percentUnder = 100))
    // unique among themselves AND disjoint from every source id — reusing a
    // source id would collapse synthetic rows in any downstream join/dedup
    assert(synth.select("vec_id").distinct().count() === synth.count())
    assert(synth.join(minority, Seq("vec_id"), "left_semi").count() === 0)
    val balanced = Smote.balance(spark, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100))
    assert(balanced.select("vec_id").distinct().count() === balanced.count())
  }

  test("balance rejects ids already in the reserved synthetic namespace") {
    val df = embFeatures
    val balanced = Smote.balance(spark, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100))
    // re-balancing a balanced frame would collide old and new synthetic
    // ids — the guard must fail fast, not silently collapse rows
    val ex = intercept[Exception] {
      Smote.balance(spark, balanced, "vec_id", "features", "cls",
        lit(0), Smote.Params(k = 2, percentOver = 100, percentUnder = 100))
        .count()
    }
    assert(ex.getMessage.contains("reserved synthetic id namespace") ||
      Option(ex.getCause).exists(_.getMessage.contains("reserved synthetic id namespace")))
  }

  test("LSH strategy: count contract holds regardless of recall") {
    val df = embFeatures
    val minority = df.filter(col("cls") === 0)
    val nMin = minority.count()
    // tiny bucketLength forces sparse buckets → some rows may come back
    // neighbourless; the self-duplication fallback must keep counts exact
    val synth = Smote.synthesize(spark, minority, "vec_id", "features",
      "cls", Smote.Params(k = 5, percentOver = 200, percentUnder = 100),
      strategy = Smote.LshKnn(bucketLength = 0.05, numHashTables = 1))
    assert(synth.count() === nMin * 2)
    val balanced = Smote.balance(spark, df, "vec_id", "features", "cls",
      lit(0), Smote.Params(k = 5, percentOver = 200, percentUnder = 100),
      Smote.LshKnn())
    val counts = balanced.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val before = df.groupBy("cls").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) === before(0) * 3)
    assert(counts(1) === before(1))
  }

  test("LSH strategy: synthetic points stay in the minority bounding box") {
    val minority = embFeatures.filter(col("cls") === 0)
    val synth = Smote.synthesize(spark, minority, "vec_id", "features",
      "cls", Smote.Params(k = 3, percentOver = 100, percentUnder = 100),
      strategy = Smote.LshKnn())
    val bounds = minority
      .select(posexplode(col("features")).as(Seq("dim", "v")))
      .groupBy("dim").agg(min("v").as("lo"), max("v").as("hi"))
    val violations = synth
      .select(posexplode(col("features")).as(Seq("dim", "v")))
      .join(bounds, "dim")
      .filter(col("v") < col("lo") - 1e-9 || col("v") > col("hi") + 1e-9)
      .count()
    assert(violations === 0)
  }

  test("params: reference bug §2.7a fixed — bounds are validated") {
    intercept[IllegalArgumentException] {
      Smote.Params(percentUnder = 5)
    }
    intercept[IllegalArgumentException] {
      Smote.Params(percentOver = 50)
    }
  }
}
