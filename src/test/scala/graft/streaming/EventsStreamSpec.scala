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
}
