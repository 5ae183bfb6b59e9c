package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter
import graft.{Q, Tables}
import graft.functions.KernelRegistry
import graft.util.Det._

/** Bloom-filter runtime pre-filter join (j7): the star-join shuffle
  * reducer.
  *
  * A selective dimension join (fact ⋈ σ(dim)) still shuffles the ENTIRE
  * fact side when the planner picks a shuffle join — every non-matching
  * fact row rides the exchange only to be discarded at the probe. At
  * 100 TB the fact shuffle IS the job cost. The fix every warehouse
  * engine applies: build a bloom filter over the dim keys (KBs–MBs
  * regardless of fact size), evaluate it map-side on the fact scan, and
  * let the exchange move only probable matches. False positives are
  * removed by the exact join that follows, so the operator is
  * result-transparent — the oracle is the PLAIN join.
  *
  * Spark-first notes: Spark's own runtime bloom
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects this
  * rewrite for some shapes; this operator is the deterministic explicit
  * form for when the rewrite doesn't fire (non-equi pre-aggregations,
  * dims behind UDF-opaque filters) — same plan shape Spark's
  * `BloomFilterMightContain` produces. The bloom builds DISTRIBUTED
  * (per-partition partial blooms OR-merged on the driver via
  * `DataFrameStatFunctions.bloomFilter`), so the driver never sees dim
  * rows, only the fixed-size bit array; the filter then ships to
  * executors inside the codegen'd expression (one reference object per
  * task closure, evaluated inline in whole-stage codegen).
  *
  * Sizing at scale: bits = -n·ln(fpp)/ln²2 ≈ 9.6 bits/key at 1% — 10⁸
  * dim keys ≈ 120 MB, at which point raise fpp (the join stays exact;
  * fpp only trades shuffled bytes) or fall back to a semi-join
  * pre-reduce. `expectedItems` is the caller's dim-cardinality estimate;
  * overshooting wastes bits, undershooting raises the realized FP rate —
  * never correctness.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pre-filtering the
    * fact side map-side with a bloom filter built from the dim keys.
    * Result-identical to the plain join for any `fpp`.
    */
  def bloomPrefilterJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1L << 16,
      fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    // call_function resolves BY NAME at analysis time, so the per-call
    // bloom state must be folded into the name (KernelRegistry contract).
    val name =
      s"bloom_might_${(System.identityHashCode(bloom) & Int.MaxValue).toHexString}"
    KernelRegistry.ensureTransient(spark, name)(
      exprs => BloomMightContain(exprs(0), bloom))
    fact.filter(call_function(name, col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** J7: lineitem pre-filtered by a bloom over PROMO part keys, then
    * exact-joined and aggregated per brand. The oracle runs the plain
    * join — bloom false positives must be invisible in the result.
    */
  private def j7BloomPrefilter(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
      .select(col("p_partkey"), col("p_brand"))
    val out = bloomPrefilterJoin(l, p, "l_partkey", "p_partkey")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        revenueSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("p_brand"))
    // Guard the claim: the bloom must actually sit in the plan as a fact-
    // side filter (otherwise this is just the plain join and the scale
    // story is vacuous).
    val plan = out.queryExecution.executedPlan.toString
    require(plan.contains("bloom_might_"),
      "bloom pre-filter missing from the executed plan:\n" + plan.take(2000))
    out
  }

  private val j7Sql =
    s"""SELECT p_brand, COUNT(*) AS n,
       |  ${sqlRevenueSum("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE p_type = 'PROMO'
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  val qs: Seq[(String, Q)] = Seq(
    "j7_bloom_prefilter" -> Q(j7BloomPrefilter, Some(j7Sql)),
  )
}

/** `bloom.mightContainLong(key)` as a codegen'd predicate — the same
  * shape as Spark's internal `BloomFilterMightContain`, but holding an
  * already-built sketch so it composes with any driver-side build
  * strategy. Null keys yield null (three-valued logic like any
  * predicate), which a Filter treats as drop — matching the inner join.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects bigint, got ${child.dataType.simpleString}")

  /** Public for generated code (called via an addReferenceObj handle). */
  def kernelEval(key: Long): Boolean = bloom.mightContainLong(key)

  override protected def nullSafeEval(k: Any): Any =
    kernelEval(k.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMight", this,
      classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.kernelEval($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
