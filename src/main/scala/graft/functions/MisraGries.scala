package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed Aggregator.
  *
  * Exact top-k over 100 TB of tokens needs a full shuffle of every
  * distinct token; Misra–Gries keeps a bounded k-entry summary per
  * partition and merges summaries associatively — the frequency of any
  * item is undercounted by at most N/k, so every item with true share
  * > N/k survives. This is the custom-aggregation extension point SURVEY
  * §4 reserves for sketches (Aggregator over TypedImperativeAggregate:
  * no Catalyst internals needed).
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    MisraGries.addCount(b, item, 1L, k)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (item, n)) => MisraGries.addCount(acc, item, n, k) }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}

object MisraGries {

  /** One Misra–Gries update step over an immutable k-bounded count map —
    * shared by the batch Aggregator above and the streaming heavy-hitter
    * state (`EventStream.heavyHitterSketches`), so both paths carry the
    * identical guarantee: any item undercounted by at most N/k, every
    * item with true share > N/k retained, for ANY processing order.
    */
  def addCount[K](b: Map[K, Long], item: K, n: Long, k: Int): Map[K, Long] = {
    if (b.contains(item)) b.updated(item, b(item) + n)
    else if (b.size < k) b.updated(item, n)
    else {
      // decrement-all by the smallest count involved; drop zeros
      val dec = math.min(n, b.values.min)
      val decremented = b.view.mapValues(_ - dec).filter(_._2 > 0).toMap
      if (n - dec > 0) decremented.updated(item, n - dec) else decremented
    }
  }

  /** The same update step over a MUTABLE map — the streaming hot path
    * (`EventStream.heavyHitterSketches`) folds one of these per EVENT,
    * and the immutable form allocated a fresh k-entry map each time;
    * this variant allocates one map per micro-batch group and mutates
    * in place. Step-identical to [[addCount]] for the same arrival
    * order (property-pinned in MisraGriesProps), so the sketch
    * guarantee is unchanged.
    */
  def addCountMutable[K](b: scala.collection.mutable.Map[K, Long],
      item: K, n: Long, k: Int): Unit =
    b.get(item) match {
      case Some(c) => b(item) = c + n
      case None if b.size < k => b(item) = n
      case None =>
        val dec = math.min(n, b.values.min)
        val dead = scala.collection.mutable.ArrayBuffer.empty[K]
        b.foreach { case (kk, c) =>
          val nc = c - dec
          if (nc > 0) b(kk) = nc else dead += kk
        }
        dead.foreach(b.remove)
        if (n - dec > 0) b(item) = n - dec
    }
}
