package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session via
  * getOrCreate; suites must not stop() it). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String) = s"/root/testdata/$name"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // "local[8, 2]": 8 threads, maxFailures=2 — plain local[8] fails the
    // job on the FIRST task failure, which would make task-retry
    // fault tolerance (FaultToleranceSpec) unwitnessable. One retry also
    // matches a real cluster's posture more closely; tests that assert
    // on thrown queries still throw (the retry re-fails instantly).
    val s = SparkSession.builder().master("local[8, 2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
