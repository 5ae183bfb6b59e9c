package graft

import java.nio.file.{Files, Path, Paths}

import graft.streaming.EventStream

/** Checkpoint-restart recovery: the production failure mode the
  * exactly-once claim (EventStream.dedupStream) is actually about. A
  * first query run lands batch 1 and stops; every event is then
  * REDELIVERED (new files, same event_ids) and a SECOND query starts
  * from the same checkpoint — exactly-once across the restart requires
  * the dedup state store to be restored from the checkpoint, because
  * the duplicates only ever arrive after it.
  */
class StreamRestartSpec extends SparkSpec {

  private def tmp(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(p)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
    p
  }

  test("file-sink dedup resumes from checkpoint: redeliveries after " +
      "restart are dropped by restored state (exactly-once)") {
    val eventsFile = Paths.get(s"$Sf0001/events.parquet")
    val src = tmp("graft_restart_src")
    val out = tmp("graft_restart_out")
    val ckp = tmp("graft_restart_ckp")

    // run 1: first delivery only; AvailableNow drains it and stops —
    // the "deploy/crash" boundary with a committed checkpoint behind it
    Files.copy(eventsFile, src.resolve("delivery_1.parquet"))
    val q1 = EventStream.dedupToFileSink(spark, src.toString, out.toString,
      ckp.toString)
    q1.awaitTermination()
    val afterRun1 = spark.read.parquet(out.toString).count()

    // full redelivery lands while the query is DOWN
    Files.copy(eventsFile, src.resolve("delivery_2_redelivery.parquet"))

    // run 2: same checkpoint + sink; must read the redelivery and emit
    // nothing new
    val q2 = EventStream.dedupToFileSink(spark, src.toString, out.toString,
      ckp.toString)
    q2.awaitTermination()
    assert(q2.recentProgress.map(_.numInputRows).sum > 0,
      "restarted query processed no input — the redelivery was not read")

    val got = spark.read.parquet(out.toString)
    val want = Tables.events(spark, Sf0001)
    assert(afterRun1 === want.count(), "run 1 must land each event once")
    assert(got.count() === want.count(),
      "restart re-emitted rows: dedup state was not restored from checkpoint")
    assert(got.select("event_id").distinct().count() === want.count())
  }
}
