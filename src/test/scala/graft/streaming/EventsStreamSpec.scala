package graft.streaming

import graft.{GraftSession, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class EventsStreamSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("streaming hourly aggregation converges to the batch result") {
    // the file stream source wants a directory; stage the single fixture file
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val batch = EventsStream.hourly(GraftSession.table(spark, SparkTestSession.sf0001, "events"))
      .collect().map(_.toSeq).toSet

    val query = EventsStream.runToMemorySink(spark, dir, "events_hourly_test")
    try {
      query.processAllAvailable()
      val streamed = spark.table("events_hourly_test").collect().map(_.toSeq).toSet
      streamed shouldBe batch
      streamed.size should be > 0
    } finally query.stop()
  }

  test("mapGroupsWithState running per-user counts converge to the batch truth") {
    val dir = java.nio.file.Files.createTempDirectory("events-state").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val events = GraftSession.table(spark, SparkTestSession.sf0001, "events")
    val batch = events.groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.max("ts").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    val query = EventsStream.statefulUserCounts(spark, dir, "user_counts_test")
    try {
      query.processAllAvailable()
      // update mode: take the LAST emitted row per user (final state)
      val rows = spark.table("user_counts_test").collect()
      val finalPerUser = rows.groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> ((rs.map(_.getLong(1)).max, rs.map(_.getLong(2)).max))
      }
      finalPerUser shouldBe batch
    } finally query.stop()
  }

  test("batch sessionization splits on the gap and preserves event counts") {
    val events = GraftSession.table(spark, SparkTestSession.sf0001, "events")
    val sessions = EventsStream.sessionize(events, gapUs = 1800L * 1000000L)
    val total = events.count()
    sessions.agg(org.apache.spark.sql.functions.sum("n_events"))
      .collect().head.getLong(0) shouldBe total
    // durations are non-negative and every session respects the gap bound
    val bad = sessions.where(org.apache.spark.sql.functions.col("duration_us") < 0).count()
    bad shouldBe 0L
  }
}
