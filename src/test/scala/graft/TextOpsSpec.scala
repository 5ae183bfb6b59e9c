package graft

import org.apache.spark.sql.functions._
import graft.ext.{SimilarityOps, TextOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lang-id identifies hand-written samples per language") {
    // The testdata documents carry random token soup (lang is synthetic
    // metadata), so real language text is planted here instead.
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy that the sun is out"),
      ("de", "der hund ist nicht mit der katze und das ist ein problem für alle"),
      ("fr", "le chat est dans la maison et il est content pour une fois que tout va bien"),
      ("es", "el perro es grande y la casa es una maravilla para los amigos con suerte"),
      ("unknown", "zxq vprt kllm wrrt bzzt")).toDF("expected", "text")
    val out = samples.select(col("expected"),
      TextOps.langId(col("text")).as("pred")).collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1),
      s"text classified as ${r.getString(1)}, expected ${r.getString(0)}"))
  }

  test("token counts agree with a local reimplementation") {
    val rows = Tables.documents(spark, Sf0001).limit(50)
      .select(col("text"), TextOps.tokenCount(col("text")).as("n")).collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getString(0).split(" ", -1).length)
    }
  }

  test("repetition stats: known values on hand-built documents") {
    val docs = Seq(
      (1L, "a a a b c b b b b"),     // 9 toks, 3 distinct, top b=5, run b b b b=4, top bigram "b b"=3
      (2L, "x"),                     // single token: no bigram, run 1
      (3L, "go go go go"),           // pure loop
      (4L, "all words here differ")  // no repetition
    ).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"),
      graft.functions.TextKernelFns.repetitionStats(spark, col("text")).as("r"))
      .select(col("doc_id"), col("r.n_toks"), col("r.n_distinct"),
        col("r.top_tok_n"), col("r.top_bigram_n"), col("r.max_run"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out(1L) === ((9L, 3L, 5L, 3L, 4L)))
    assert(out(2L) === ((1L, 1L, 1L, 0L, 1L)))
    assert(out(3L) === ((4L, 1L, 4L, 3L, 4L)))
    assert(out(4L) === ((4L, 4L, 1L, 1L, 1L)))
  }

  test("fingerprints are stable across partitionings") {
    val a = SparkEntry.queries("t4_fingerprint")(spark, Sf0001).collect()
    val b = SparkEntry.queries("t4_fingerprint")(spark, Sf0001).collect()
    assert(a.map(_.getLong(1)).toSeq === b.map(_.getLong(1)).toSeq)
  }

  test("Misra-Gries sketch surfaces every true heavy hitter") {
    import org.apache.spark.sql.Dataset
    val toks: Dataset[String] = Tables.documents(spark, Sf0001)
      .select(explode(split(lower(col("text")), " ")).as("value"))
      .filter(length(col("value")) > 0)
      .as[String]
    val n = toks.count()
    val k = 50
    val sketch = toks.select(new graft.functions.MisraGries(k).toColumn)
      .head()
    // every token with true frequency > N/k must be present in the sketch
    val exact = toks.groupBy("value").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val mustHave = exact.filter(_._2 > n / k).keySet
    assert(mustHave.subsetOf(sketch.keySet),
      s"missing heavy hitters: ${mustHave -- sketch.keySet}")
    // and sketch counts never exceed true counts by construction
    sketch.foreach { case (t, c) => assert(c <= exact.getOrElse(t, 0L)) }
  }

  test("null-aware profiling: nullProfile counts injected nulls exactly") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, null),
      (null, null)).toDF("x", "y")
    val row = profile.Profiling.nullProfile(df).head()
    assert(row.getLong(0) === 2L && row.getLong(1) === 2L)
  }

  test("lang-id kernel is identical to the expression form") {
    val docs = Tables.documents(spark, Sf0001)
    val expr = docs.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kernel = docs.select(col("doc_id"),
      graft.functions.TextKernelFns.langId(spark, col("text"),
        TextOps.LangMarkers.toSeq).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel === expr)
  }

  test("IVF top-k achieves high recall vs brute force") {
    val emb = Tables.embeddings(spark, Sf0001).cache()
    val queries = emb.filter(col("vec_id") < 10)
    val brute = SimilarityOps.bruteForceTopK(emb, queries, 10)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(emb, queries, 10, nCells = 16, nProbe = 4)
      .select("q_id", "c_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing 4/16 cells of random embeddings; must beat the 25% a random
    // cell assignment would give
    assert(recall > 0.3, s"IVF recall $recall too low")
  }

  test("x10: filtered search never crosses labels, exact or through the IVF") {
    val emb = Tables.embeddings(spark, Sf0001).cache()
    val q = emb.filter(col("vec_id") < 10)
    val lab = emb.select(col("vec_id"), col("label"))
    def crossLabel(df: org.apache.spark.sql.DataFrame): Long = df
      .join(lab.select(col("vec_id").as("q_id"), col("label").as("ql")), "q_id")
      .join(lab.select(col("vec_id").as("c_id"), col("label").as("cl")), "c_id")
      .filter(col("ql") =!= col("cl")).count()
    val exact = SimilarityOps.filteredBruteTopK(emb, q, 5)
    val ivf = SimilarityOps.ivfTopK(emb, q, 5, matchLabel = true)
    assert(crossLabel(exact.select("q_id", "c_id")) === 0)
    assert(crossLabel(ivf.select("q_id", "c_id")) === 0)
    // the filtered index keeps useful recall vs the filtered exact
    val ex = exact.select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ap = ivf.select("q_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((ex & ap).size.toDouble / ex.size > 0.3)
  }

  test("t17: BM25 matches the hand-computed formula on a tiny corpus") {
    import spark.implicits._
    // 3 docs, all length 4 → avgdl = 4, length norm = 1.0 everywhere
    val docs = Seq(
      (1L, "hash join hash scan"),
      (2L, "join scan scan filter"),
      (3L, "scan filter value sort")).toDF("doc_id", "text")
    val out = TextOps.bm25Score(docs, Seq("hash", "join")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toMap
    def idf(df: Int) = math.log(1 + ((3 - df).toDouble + 0.5) / (df + 0.5))
    def w(tf: Int, df: Int) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (4.0 / 4.0)))
    assert(out.keySet == Set(1L, 2L))           // doc 3 matches no term
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L)
    assert(math.abs(out(1L)._2 - (w(2, 1) + w(1, 2))) < 2e-6)
    assert(math.abs(out(2L)._2 - w(1, 2)) < 2e-6)
    // rarer term ("hash", df=1) outweighs the common one at equal tf
    assert(w(1, 1) > w(1, 2))
  }

  test("t17: longer documents are length-penalized at equal tf") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hash scan"),
      (2L, "hash scan scan scan scan scan scan scan")).toDF("doc_id", "text")
    val out = TextOps.bm25Score(docs, Seq("hash")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out(1L) > out(2L))
  }

  test("t18: landed inverted index serves bit-identical scores to t17 " +
      "and the serve scan partition-prunes to the query terms") {
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaIndex = TextOps.bm25Indexed(spark, Sf0001, TextOps.Bm25Terms)
    assert(rows(viaIndex) ===
      rows(TextOps.bm25Score(Tables.documents(spark, Sf0001),
        TextOps.Bm25Terms)))
    // second call reuses the landed layout (once-per-version memo)
    assert(TextOps.bm25IndexDir(spark, Sf0001) ===
      TextOps.bm25IndexDir(spark, Sf0001))
    // the postings scan must carry a static tok IN (...) PARTITION
    // filter and read only those terms' posting lists
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val one = TextOps.bm25Indexed(spark, Sf0001, TextOps.Bm25Terms)
      one.collect()
      val pruned = one.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.partitionFilters.nonEmpty => f
      }
      assert(pruned.nonEmpty, "postings scan carries no partition filter")
      val total = spark.read
        .parquet(s"${TextOps.bm25IndexDir(spark, Sf0001)}/postings").count()
      val read = pruned.map(_.metrics("numOutputRows").value).sum
      assert(read > 0 && read < total,
        s"pruned scan should read a strict subset of the postings " +
          s"($read of $total rows)")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("t19: BPE fold reproduces the hand-computed merge sequence, " +
      "including weighted overlap counts and left-to-right merging") {
    // dict {aaab: 3, ab: 2}. Round 1: (a,a) counted WITH overlap = 2·3=6
    // beats (a,b)=3+2=5 → merge; left-to-right gives [aa,a,b] (not
    // [a,aa,b]). Round 2: (a,b)=3+2=5 beats (aa,a)=3. Round 3: (aa,ab)=3.
    val merges = TextOps.bpeMerges(Seq("aaab" -> 3L, "ab" -> 2L), 5)
    assert(merges === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
    // round 4+: no adjacent pairs remain anywhere → fold stops emitting
    assert(merges.length === 3)
  }

  test("t19: tie on count breaks lexicographically by (lhs, rhs)") {
    val merges = TextOps.bpeMerges(Seq("xy" -> 2L, "yz" -> 2L), 1)
    assert(merges.head === ((1, "x", "y", "xy", 2L)))
  }

  test("t19: registered query emits one row per productive round on the " +
      "real corpus") {
    val rows = SparkEntry.queries("t19_bpe_merges")(spark, Sf001).collect()
    assert(rows.length === TextOps.BpeMerges,
      s"expected ${TextOps.BpeMerges} merges, got ${rows.length}")
    // merged symbol is always lhs+rhs and counts never increase mid-run
    // beyond the previous round's ceiling within the same fold
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ===
        r.getAs[String]("lhs") + r.getAs[String]("rhs"))
    }
  }
}
