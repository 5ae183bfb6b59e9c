package graft

import org.apache.spark.sql.functions._
import graft.ext.{DedupOps, TextOps}
import graft.functions.TextKernelFns

/** Adversarial parity suite for the single-pass text kernels: every
  * kernel must be bit-identical to the SQL-expression form it replaced,
  * over inputs chosen to stress tokenization edges — leading/trailing
  * whitespace (Java split keeps those empties with limit -1), mixed
  * whitespace classes (\\s+ vs the literal-space split of lang-id),
  * unicode case folding (UTF8String.toLowerCase), degenerate docs
  * (empty, whitespace-only, fewer tokens than the shingle width), and
  * seeded random soup.
  */
class TextKernelsSpec extends SparkSpec {

  private def corpus: Seq[String] = {
    val edge = Seq(
      "",
      " ",
      "   ",
      "\t\n ",
      "a",
      "a b",
      "a  b",                       // double space: empty token inside
      " a b c ",                    // leading/trailing empties
      "a\tb\nc d",                  // mixed whitespace classes
      "the the the",                // duplicate shingles
      "ÄÖÜ ß İ I",                  // unicode lowercasing
      "für die das und",            // de markers with umlauts
      "la le les et est",           // fr markers
      "el los y es THE AND",        // mixed-language + case
      "word",                       // < w tokens
      "two words",                  // exactly w-1 tokens
      "one two three",              // exactly w tokens
      "😀 emoji 😀 tokens",
      "punct, tokens. here! ok?",
      "x" * 500,                    // one huge token
      ("tok " * 200).trim,          // many tokens
    )
    val rng = new scala.util.Random(7L)
    val alphabet = "ab cde \t\nü,.!😀"
    val fuzz = Seq.fill(150)(
      (0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
    edge ++ fuzz
  }

  private val NullId = 9999L

  private def docsDf = {
    import spark.implicits._
    (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      ((NullId, null: String))).toDF("doc_id", "text")
  }

  test("shingle-hash kernel ≡ HOF chain on adversarial inputs") {
    val docs = docsDf
    val expr = docs.select(col("doc_id"),
      array_sort(array_distinct(transform(DedupOps.shingles(col("text"), 3),
        s => xxhash64(s)))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = docs.select(col("doc_id"),
      array_sort(TextKernelFns.shingleHashes(spark, col("text"), 3)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel === expr)
  }

  test("minhash kernel ≡ explode+aggregate form on adversarial inputs") {
    val docs = docsDf
    val mask = lit(0xffffffffL)
    val expr = docs
      .select(col("doc_id"), explode(DedupOps.shingles(col("text"), 3)).as("sh"))
      .select(col("doc_id"),
        xxhash64(col("sh")).bitwiseAND(mask).as("_h1"),
        xxhash64(col("sh"), lit(0x9747b28c)).bitwiseAND(mask).as("_h2"))
      .groupBy(col("doc_id"))
      .agg(array((0 until 16).map { k =>
        min(col("_h1") + lit(k.toLong) * col("_h2"))
      }: _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = DedupOps.minhashSignatures(docs, 3, 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel === expr)
    // the empty doc has no shingle (its only candidate is "" — filtered)
    // and must vanish exactly like the aggregation form; " " does NOT
    // vanish: two empty tokens join to the single-space shingle
    assert(!kernel.contains(0L))
    assert(kernel.contains(1L))
  }

  test("md5-minhash kernel ≡ explode+min(substring(md5)) form on adversarial inputs") {
    val docs = docsDf
    val expr = DedupOps.md5SigExpressionForm(docs, 3, 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val kernel = docs.select(col("doc_id"),
      TextKernelFns.md5MinhashSig(spark, col("text"), 3, 8).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(kernel === expr)
    assert(!kernel.contains(0L))   // shingle-less docs vanish both ways
    assert(!kernel.contains(NullId))
  }

  test("simhash kernel ≡ per-row expression form on adversarial inputs") {
    val docs = docsDf
    val expr = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), DedupOps.simhash64(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = DedupOps.simhashTable(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === expr)
    // null-text docs vanish from the table (explode-of-null semantics)
    assert(!kernel.contains(NullId))
  }

  test("lang-id kernel ≡ expression form on adversarial inputs") {
    val docs = docsDf
    val expr = docs.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kernel = docs.select(col("doc_id"),
      TextKernelFns.langId(spark, col("text"), TextOps.LangMarkers.toSeq).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kernel === expr)
  }

  test("poly fingerprint: known values, codepoint (not UTF-16) semantics") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextKernels
    assert(TextKernels.polyFingerprint(UTF8String.fromString("")) === 0L)
    // "ab": (0·31 + 97)·31 + 98 = 3105
    assert(TextKernels.polyFingerprint(UTF8String.fromString("ab")) === 3105L)
    // U+1F600 is ONE codepoint (128512), not its two surrogate units —
    // matches DuckDB's unicode(c) per character
    assert(TextKernels.polyFingerprint(
      UTF8String.fromString("😀")) === 128512L)
  }
}
