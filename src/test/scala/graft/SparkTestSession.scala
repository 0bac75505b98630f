package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test / fork := true → one JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.build("graft-test", cores = 8)
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
