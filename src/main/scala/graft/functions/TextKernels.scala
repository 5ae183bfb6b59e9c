package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-sketch kernels.
  *
  * The SQL-expression forms of shingling/minhash/simhash (DedupOps) walk
  * interpreted higher-order-function chains — sequence → transform(slice ∘
  * concat_ws) → filter → array_distinct per document, then explode +
  * shuffle to aggregate. Profiling at sf0.1 put the shingle explode alone
  * at ~3.2 s of d2's ~4.5 s. These kernels do the whole sketch in one
  * tight JVM loop per document, called directly from whole-stage codegen
  * (a static forwarder call — the projection stays fused), and make
  * minhash/simhash map-only: no explode, no aggregation shuffle.
  *
  * Parity: tokenization replicates `split(lower(text), regex, -1)` (Java
  * regex semantics — leading/trailing empties kept) and hashes replicate
  * Spark's `xxhash64` (XXH64 over UTF-8 bytes, seed 42; the second
  * Kirsch–Mitzenmacher hash chains an int literal exactly like the
  * multi-argument xxhash64 expression). DedupSimilaritySpec asserts
  * bit-equality against the original expression forms.
  */
object TextKernels {

  /** Replicates xxhash64(string): XXH64 over UTF-8 bytes, seed 42. */
  def xxhashString(s: String, seed: Long): Long = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }

  /** Tokens of `split(lower(text), "\\s+", -1)`, Java regex semantics. */
  private def tokens(text: UTF8String): Array[String] =
    text.toLowerCase.toString.split("\\s+", -1)

  /** Distinct w-token shingle strings, in first-seen order (order is
    * irrelevant to every consumer; the SET is the contract).
    */
  private def shingleSet(text: UTF8String, w: Int): java.util.LinkedHashSet[String] = {
    val toks = tokens(text)
    val n = toks.length
    val out = new java.util.LinkedHashSet[String]()
    val last = math.max(n - w, 0)
    var i = 0
    while (i <= last) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + w, n)
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      if (sb.length > 0) out.add(sb.toString)
      i += 1
    }
    out
  }

  /** xxhash64 of each distinct w-shingle (seed 42 — identical values to
    * the SQL `xxhash64(shingle)` form). Used by d4's exact Jaccard.
    */
  def shingleHashes(text: UTF8String, w: Int): ArrayData = {
    val set = shingleSet(text, w)
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = xxhashString(it.next(), 42L); i += 1 }
    new GenericArrayData(out)
  }

  /** The exact second-hash family of the SQL form `xxhash64(sh, lit(seed2))`:
    * multi-argument xxhash64 chains — hash the string with seed 42, then
    * hash the int literal with that result as seed.
    */
  private def kmSecondHash(sh: String, seed2: Int): Long =
    XXH64.hashInt(seed2, xxhashString(sh, 42L))

  /** Kirsch–Mitzenmacher minhash signature over distinct w-shingles:
    * sig_j = min over shingles of (h1 + j·h2), hashes masked to 32 bits
    * (ANSI-overflow-safe). Bit-identical to DedupOps' expression+agg form,
    * but map-only: one kernel call per document, no explode, no shuffle.
    */
  def minhashSig(text: UTF8String, w: Int, numHashes: Int): ArrayData = {
    val set = shingleSet(text, w)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val it = set.iterator()
    val empty = set.isEmpty
    while (it.hasNext) {
      val sh = it.next()
      val h1 = xxhashString(sh, 42L) & 0xffffffffL
      val h2 = kmSecondHash(sh, 0x9747b28c) & 0xffffffffL
      var j = 0
      while (j < numHashes) {
        val v = h1 + j.toLong * h2
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }
    if (empty) null else new GenericArrayData(sig)
  }

  private val md5Digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex of a digest — same text Spark's md5() expression emits. */
  private def toHex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = HexChars((b(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Engine-portable minhash signature (d2b): per distinct w-shingle, the
    * lowercase md5 hex; permutation j's hash is the 4-hex-char slice at
    * [4j, 4j+4) and the signature entry is the LEXICOGRAPHIC min of those
    * slices — bit-identical values to the explode + min(substring(md5))
    * expression form (spec-asserted), computed map-only in one pass: no
    * shingle explode, no per-doc aggregation shuffle. Portability lives
    * in the VALUES (standard md5 both engines agree on), not in the plan
    * shape. Null for shingle-less docs, like minhashSig.
    */
  def md5MinhashSig(text: UTF8String, w: Int, numHashes: Int): ArrayData = {
    require(numHashes >= 1 && numHashes <= 8,
      s"md5 yields 32 hex chars = 8 four-char permutation slices, got $numHashes")
    val set = shingleSet(text, w)
    if (set.isEmpty) return null
    val sig = new Array[String](numHashes)
    val md = md5Digest.get()
    val it = set.iterator()
    while (it.hasNext) {
      md.reset()
      val hex = toHex(md.digest(
        it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      var j = 0
      while (j < numHashes) {
        val s = hex.substring(4 * j, 4 * j + 4)
        if (sig(j) == null || s.compareTo(sig(j)) < 0) sig(j) = s
        j += 1
      }
    }
    new GenericArrayData(sig.map(UTF8String.fromString(_)): Array[AnyRef])
  }

  /** Polynomial rolling fingerprint over unicode codepoints:
    * h := (h·31 + codepoint) mod (2³¹−1), h₀ = 0. Deliberately
    * engine-neutral — any engine that can fold over codepoints computes
    * the identical value (the DuckDB oracle does, via
    * list_reduce/unicode), unlike xxhash64 whose seeding is
    * Spark-specific. One tight loop per document, codegen'd.
    */
  def polyFingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    h
  }

  /** Single-pass repetition profile over the single-space token split
    * (same tokenization as t7/t9: `split(lower(text), ' ', -1)`, empties
    * kept). Returns (n_toks, n_distinct, top_tok_n, top_bigram_n,
    * max_run): the most-frequent-token count, the most-frequent
    * consecutive-bigram count, and the longest same-token run — the raw
    * ingredients of Gopher-style repetition filters (Rae et al. 2021,
    * "Scaling Language Models", App. A1.1), which an expression form
    * would need an O(n²) interpreted mode-of-array to compute. Only
    * counts are returned (no argmax token), so tie-breaks cannot matter
    * and a plain-SQL oracle reproduces every field exactly.
    */
  def repetitionStats(text: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val n = toks.length
    val tokCounts = new java.util.HashMap[String, Int]()
    val bigramCounts = new java.util.HashMap[String, Int]()
    var topTok = 0
    var topBigram = 0
    var maxRun = 0
    var run = 0
    var i = 0
    while (i < n) {
      val c = tokCounts.merge(toks(i), 1, Integer.sum)
      if (c > topTok) topTok = c
      if (i > 0 && toks(i) == toks(i - 1)) run += 1 else run = 1
      if (run > maxRun) maxRun = run
      if (i < n - 1) {
        val b = bigramCounts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
        if (b > topBigram) topBigram = b
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, tokCounts.size.toLong, topTok.toLong,
        topBigram.toLong, maxRun.toLong))
  }

  /** 64-bit SimHash over token xxhash64s — identical to DedupOps'
    * simhashTable aggregation (every token, empties included, hashed with
    * seed 42; bit b set iff more tokens have bit b than not). Map-only.
    */
  def simhash(text: UTF8String): Long = {
    val toks = tokens(text)
    val sums = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = xxhashString(toks(t), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) out += (1L << b)
      b += 1
    }
    out
  }
}

/** array<long> of distinct w-shingle xxhash64s (codegen: direct static
  * call, stays inside whole-stage codegen).
  */
case class ShingleHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.shingleHashes(t.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingleHashes($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> minhash signature (null for shingle-less docs — matches the
  * aggregation form, where such docs produce no row).
  */
case class MinHashSigExpr(child: Expression, w: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.minhashSig(t.asInstanceOf[UTF8String], w, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TextKernels.minhashSig($c, $w, $numHashes);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<string> engine-portable md5 minhash signature (null for
  * shingle-less docs — matches the explode form, where such docs produce
  * no row).
  */
case class Md5MinHashSigExpr(child: Expression, w: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"md5_minhash_sig expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.md5MinhashSig(t.asInstanceOf[UTF8String], w, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TextKernels.md5MinhashSig($c, $w, $numHashes);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Stopword-profile language ID in one pass: count marker hits per
  * language over the single-space token split, argmax with ties to the
  * LARGEST language name (exactly Spark's greatest-of-structs on
  * (score, lang)), "unknown" when every score is zero. Replaces four
  * interpreted filter∘isin lambda passes per row.
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"lang_id expects string, got ${child.dataType.simpleString}")

  // langs ascending so the `>` tie-break reproduces greatest-of-structs
  @transient private lazy val langs: Array[String] =
    markers.map(_._1).sorted.toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langs.map { l =>
      val s = new java.util.HashSet[String]()
      markers.toMap.apply(l).foreach(s.add)
      s
    }

  /** Public for generated code (called via an addReferenceObj handle). */
  def kernelEval(text: UTF8String): UTF8String = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    var bestScore = -1
    var bestLang: String = null
    var i = 0
    while (i < langs.length) {
      var sc = 0
      var t = 0
      while (t < toks.length) {
        if (sets(i).contains(toks(t))) sc += 1
        t += 1
      }
      if (sc > bestScore || (sc == bestScore && langs(i) > bestLang)) {
        bestScore = sc; bestLang = langs(i)
      }
      i += 1
    }
    UTF8String.fromString(if (bestScore > 0) bestLang else "unknown")
  }

  override protected def nullSafeEval(t: Any): Any =
    kernelEval(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdExpr", this, classOf[LangIdExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernelEval($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** long polynomial rolling fingerprint of the codepoint stream (codegen). */
case class PolyFingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"poly_fingerprint expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.polyFingerprint(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.polyFingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(n_toks, n_distinct, top_tok_n, top_bigram_n, max_run) repetition
  * profile of the token stream (codegen; one kernel call per row).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"repetition_stats expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.repetitionStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_toks", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_tok_n", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))
}

/** 64-bit simhash of the token stream (codegen). */
case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64k expects string, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(t: Any): Any =
    TextKernels.simhash(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernelFns {
  /** Register the kernels in the session FunctionRegistry (idempotent;
    * `new Column(expr)` is private in Spark 4 — CLAUDE.md convention).
    */
  /** The stateless SQL-callable kernels, as data: consumed by [[register]]
    * (runtime, per-session) and by `plans.GraftExtensions.injectFunction`
    * (session build — a pure-SQL session gets them with no Scala call).
    */
  val kernels: Seq[(String, Seq[Expression] => Expression)] = {
    def intLit(e: Expression): Int =
      e.eval(null).asInstanceOf[Number].intValue()
    Seq(
      "shingle_hashes" ->
        (exprs => ShingleHashesExpr(exprs(0), intLit(exprs(1)))),
      "minhash_sig" ->
        (exprs => MinHashSigExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))),
      "simhash64k" -> (exprs => SimHashExpr(exprs(0))),
      "poly_fingerprint" -> (exprs => PolyFingerprintExpr(exprs(0))),
      "repetition_stats" -> (exprs => RepetitionStatsExpr(exprs(0))),
      "md5_minhash_sig" ->
        (exprs => Md5MinHashSigExpr(exprs(0), intLit(exprs(1)), intLit(exprs(2)))),
    )
  }

  def register(spark: SparkSession): Unit =
    kernels.foreach { case (n, b) => KernelRegistry.ensure(spark, n)(b) }

  def shingleHashes(spark: SparkSession, text: Column, w: Int): Column = {
    register(spark)
    // null text → empty set, matching the HOF chain (greatest() skips the
    // null size and concat_ws treats the null slice as empty, so the
    // expression form yields [] — never null — for null input)
    org.apache.spark.sql.functions.coalesce(
      call_function("shingle_hashes", text,
        org.apache.spark.sql.functions.lit(w)),
      org.apache.spark.sql.functions.typedLit(Seq.empty[Long]))
  }

  def minhashSig(spark: SparkSession, text: Column, w: Int,
      numHashes: Int): Column = {
    register(spark)
    call_function("minhash_sig", text,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(numHashes))
  }

  def simhash(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash64k", text)
  }

  def polyFingerprint(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("poly_fingerprint", text)
  }

  def repetitionStats(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("repetition_stats", text)
  }

  def md5MinhashSig(spark: SparkSession, text: Column, w: Int,
      numHashes: Int): Column = {
    register(spark)
    call_function("md5_minhash_sig", text,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(numHashes))
  }

  def langId(spark: SparkSession, text: Column,
      markers: Seq[(String, Seq[String])]): Column = {
    // state-hashed name: resolution happens at analysis time, so two
    // marker sets in one plan must not share a registry entry; use the
    // Column immediately (KernelRegistry use-immediately contract — the
    // name can be LRU-evicted after MaxTransient later registrations)
    val name = s"lang_id_${(markers.hashCode & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => LangIdExpr(exprs(0), markers))
    // null text → "unknown", matching the expression form (its
    // when(null > 0).otherwise path lands on the otherwise branch)
    org.apache.spark.sql.functions.coalesce(
      call_function(name, text),
      org.apache.spark.sql.functions.lit("unknown"))
  }
}
