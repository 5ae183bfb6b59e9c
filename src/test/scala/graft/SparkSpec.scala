package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM via Test/fork; getOrCreate
  * returns the same session everywhere).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val Sf0001 = "/root/testdata/sf0.001"
  val Sf001  = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // temp warehouse (static conf, must be set at build); deleted on JVM
    // exit — repeated `sbt test` runs were leaking one dir with bucketed
    // table data per run
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    sys.addShutdownHook {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(wh)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.warehouse.dir", wh.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
