package graft.tools

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Where does a finite streaming query's wall-clock go? Attaches a
  * StreamingQueryListener and prints each micro-batch's durationMs
  * breakdown (triggerExecution = total; addBatch = the data work;
  * the rest is offset/commit/state bookkeeping) plus the gap between
  * batches — the fixed costs the bench's min-of-3 cannot localize.
  *
  * Usage: `Test/runMain graft.tools.StreamProbe <query...> [-- <sfDir>]`
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val (head, rest) = args.span(_ != "--")
    val dir = rest.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSpec.session
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] START ${e.name} at ${e.timestamp}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val d = p.durationMs.asScala.toSeq.sortBy(-_._2)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"[stream] ${p.name} batch=${p.batchId} rows=${p.numInputRows} $d")
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] END")
    }
    s.streams.addListener(listener)
    for (n <- head) {
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(s, dir).count()
      val t1 = System.nanoTime()
      println(f"[stream] $n run1 total=${(t1 - t0) / 1e9}%.2fs rows=$c")
      val t2 = System.nanoTime()
      SparkEntry.queries(n)(s, dir).count()
      val t3 = System.nanoTime()
      println(f"[stream] $n run2 total=${(t3 - t2) / 1e9}%.2fs")
    }
  }
}
