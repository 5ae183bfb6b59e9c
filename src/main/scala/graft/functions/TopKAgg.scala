package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state top-k buffer: the k best (key, payload) pairs seen so
  * far under the ranking (key DESC, payload ASC) — w1's exact tie rule.
  * Arrays, not a heap: k is small (the whole point of a top-k aggregate
  * is k ≪ group size), so the once-per-overflowing-insert linear scan
  * for the incumbent worst is cheaper than heap bookkeeping and
  * impossible to get subtly wrong.
  */
final class TopKPairsBuffer(val k: Int) {
  val keys = new Array[Long](k)
  val pays = new Array[Long](k)
  var size = 0

  /** a ranks strictly before b? */
  @inline private def beats(ak: Long, ap: Long, bk: Long, bp: Long): Boolean =
    ak > bk || (ak == bk && ap < bp)

  def insert(key: Long, pay: Long): Unit = {
    if (size < k) {
      keys(size) = key; pays(size) = pay; size += 1
    } else if (k > 0) {
      var w = 0
      var i = 1
      while (i < size) {
        if (beats(keys(w), pays(w), keys(i), pays(i))) w = i
        i += 1
      }
      if (beats(key, pay, keys(w), pays(w))) { keys(w) = key; pays(w) = pay }
    }
  }

  def mergeFrom(o: TopKPairsBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.keys(i), o.pays(i)); i += 1 }
  }

  /** Pairs in rank order (key DESC, payload ASC) — ordered by the same
    * [[beats]] predicate as insertion: negating the key would overflow at
    * Long.MinValue and sort that key as best instead of worst.
    */
  def sorted: Array[(Long, Long)] = {
    val out = Array.tabulate(size)(i => (keys(i), pays(i)))
    out.sortWith { case ((ak, ap), (bk, bp)) => beats(ak, ap, bk, bp) }
  }
}

/** `topk_pairs_<k>(key, payload)` — per-group top-k as a
  * TypedImperativeAggregate, the SURVEY §2 tier-(b) answer to the
  * sort+window top-k shape (w1): an aggregate with BOUNDED per-group
  * state gets Spark's partial/final split for free, so each map
  * partition ships at most k rows PER GROUP into the exchange instead
  * of every row — at 100 TB the difference between shuffling the fact
  * table and shuffling ≤ k·groups·partitions slivers. Determinism is
  * total: the ranking (key DESC, payload ASC) is a strict total order
  * on distinct pairs, so the kept set and its emitted order are
  * independent of partitioning and merge order.
  *
  * Returns array<struct<key, payload>> in rank order; callers
  * posexplode to (rank, key, payload) rows. Exact-integer keys only
  * (LongType both args) — the Det doctrine: ranking money means
  * ranking cents.
  */
case class TopKPairsAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairsBuffer] {

  require(k > 0 && k <= (1 << 20), s"k out of range: $k")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairsAgg.Result
  override def prettyName: String = s"topk_pairs_$k"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (keyExpr.dataType == LongType && payloadExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got " +
          s"(${keyExpr.dataType.sql}, ${payloadExpr.dataType.sql})")
  }

  override def createAggregationBuffer(): TopKPairsBuffer =
    new TopKPairsBuffer(k)

  override def update(buf: TopKPairsBuffer, input: InternalRow)
      : TopKPairsBuffer = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null)
      buf.insert(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKPairsBuffer, other: TopKPairsBuffer)
      : TopKPairsBuffer = { buf.mergeFrom(other); buf }

  override def eval(buf: TopKPairsBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (key, pay) =>
      new GenericInternalRow(Array[Any](key, pay))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.keys(i)); bb.putLong(buf.pays(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKPairsBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsAgg =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKPairsAgg {
  val Result: DataType = ArrayType(StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)

  /** Registered-name builder: k is per-call state, folded into the name
    * (the KernelRegistry contract — `call_function` resolves by name).
    */
  def ensure(spark: org.apache.spark.sql.SparkSession, k: Int): String = {
    val name = s"topk_pairs_$k"
    KernelRegistry.ensure(spark, name)(exprs =>
      TopKPairsAgg(exprs(0), exprs(1), k))
    name
  }
}

/** [[TopKPairsBuffer]]'s double-key, PAYLOAD-DISTINCT sibling: the k best
  * (key DESC, payload ASC) pairs over DISTINCT payloads. Built for
  * candidate streams that may deliver the same (query, candidate) pair
  * several times with a bit-identical score (x7's multi-table LSH
  * buckets): distinctness in the buffer replaces a corpus-sized
  * dropDuplicates exchange — duplicates of a kept payload are skipped,
  * duplicates of an evicted payload lose to the incumbent worst exactly
  * like their first copy did, so the kept set is the k best distinct
  * pairs regardless of partitioning or merge order. NaN keys must be
  * filtered by the caller (NaN compares false under IEEE `>`, which
  * would make inserts order-dependent).
  */
final class TopKDPairsBuffer(val k: Int) {
  val keys = new Array[Double](k)
  val pays = new Array[Long](k)
  var size = 0

  @inline private def beats(ak: Double, ap: Long, bk: Double, bp: Long): Boolean =
    ak > bk || (ak == bk && ap < bp)

  def insert(key: Double, pay: Long): Unit = {
    var i = 0
    while (i < size) { if (pays(i) == pay) return; i += 1 }
    if (size < k) {
      keys(size) = key; pays(size) = pay; size += 1
    } else if (k > 0) {
      var w = 0
      i = 1
      while (i < size) {
        if (beats(keys(w), pays(w), keys(i), pays(i))) w = i
        i += 1
      }
      if (beats(key, pay, keys(w), pays(w))) { keys(w) = key; pays(w) = pay }
    }
  }

  def mergeFrom(o: TopKDPairsBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.keys(i), o.pays(i)); i += 1 }
  }

  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(size)(i => (keys(i), pays(i)))
    out.sortWith { case ((ak, ap), (bk, bp)) => beats(ak, ap, bk, bp) }
  }
}

/** `topk_dpairs_<k>(key double, payload bigint)` — per-group top-k over
  * DISTINCT payloads with a double ranking key (score DESC, payload ASC
  * — the ANN top-k tie rule). Same bounded-state partial/final split as
  * [[TopKPairsAgg]]: each map partition ships ≤ k rows per group into
  * the exchange, so a multi-million-row candidate set reduces map-side
  * and only k·groups·partitions slivers shuffle.
  */
case class TopKDPairsAgg(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKDPairsBuffer] {

  require(k > 0 && k <= (1 << 20), s"k out of range: $k")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKDPairsAgg.Result
  override def prettyName: String = s"topk_dpairs_$k"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (keyExpr.dataType == DoubleType && payloadExpr.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"(${keyExpr.dataType.sql}, ${payloadExpr.dataType.sql})")
  }

  override def createAggregationBuffer(): TopKDPairsBuffer =
    new TopKDPairsBuffer(k)

  override def update(buf: TopKDPairsBuffer, input: InternalRow)
      : TopKDPairsBuffer = {
    val kv = keyExpr.eval(input)
    val pv = payloadExpr.eval(input)
    if (kv != null && pv != null)
      buf.insert(kv.asInstanceOf[Double], pv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKDPairsBuffer, other: TopKDPairsBuffer)
      : TopKDPairsBuffer = { buf.mergeFrom(other); buf }

  override def eval(buf: TopKDPairsBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (key, pay) =>
      new GenericInternalRow(Array[Any](key, pay))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKDPairsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.keys(i)); bb.putLong(buf.pays(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKDPairsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = new TopKDPairsBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKDPairsAgg =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKDPairsAgg =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKDPairsAgg =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKDPairsAgg {
  val Result: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))),
    containsNull = false)

  def ensure(spark: org.apache.spark.sql.SparkSession, k: Int): String = {
    val name = s"topk_dpairs_$k"
    KernelRegistry.ensure(spark, name)(exprs =>
      TopKDPairsAgg(exprs(0), exprs(1), k))
    name
  }
}
