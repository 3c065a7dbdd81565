package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (ScalaTest runs them in one
  * JVM; `getOrCreate` returns the same session everywhere).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // local[4,2]: 4 threads, maxFailures=2 — task retry must be ON so the
    // crash-injection spec (MapReduceSpec) can exercise re-execution the
    // way the reference's crash test does; retries are inert elsewhere.
    val s = GraftSession.builder("local[4,2]", "4")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf: String = "/root/testdata/sf0.001"

  /** Temp dir with a RECURSIVE shutdown-hook cleanup (deleteOnExit
    * removes only empty dirs — populated output trees leaked one /tmp
    * copy per run). Shared so the cleanup behavior stays single-sourced.
    */
  def tmpDir(prefix: String): java.nio.file.Path = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(d))
        java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }))
    d
  }
}
