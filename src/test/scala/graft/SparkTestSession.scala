package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Test / fork := true → one JVM).
  *
  * Sorts/aggregations are force-spilled past 2k elements per operator: the
  * spill readers stream records through ONE reused byte buffer, so any
  * operator that caches an eval'd buffer-backed value (UTF8String/Binary)
  * without copying goes wrong HERE, the way it would under real memory
  * pressure at scale — in-memory runs keep sorter pages alive and mask it
  * (found via AsOfJoinExec's cached right key).
  */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.build("graft-test", cores = 8,
    extraConf = Map(
      "spark.shuffle.spill.numElementsForceSpillThreshold" -> "2000",
      "spark.sql.windowExec.buffer.spill.threshold" -> "2000",
      "spark.sql.sortMergeJoinExec.buffer.spill.threshold" -> "2000"))
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
