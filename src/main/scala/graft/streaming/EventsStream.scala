package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the events table: the same tumbling-window
  * aggregation the batch catalog runs (x13), expressed once and reused by
  * both the batch and streaming paths — `readStream` → event-time window +
  * watermark → aggregate. The reference has no streaming semantics
  * (SURVEY.md §2.8); this is the extension path for continuous ingestion at
  * scale, where the same hourly aggregate must keep running state bounded
  * (watermark) instead of re-scanning the corpus.
  */
object EventsStream {

  /** events.parquet physical schema under nanosAsLong (ts = epoch nanos). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transform: epoch-nano BIGINT → event-time, 1-hour tumbling
    * window per event type with exact milli-unit value sums. Works on both
    * a batch DataFrame and a streaming one (same logical plan either way).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value") * 1000).cast("long")).as("value_milli_sum"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("value_milli_sum"))

  /** Stream the events directory as a file source and run [[hourly]] into an
    * in-memory sink (complete mode: every window stays queryable). Returns
    * the started query; callers `processAllAvailable()` then read the sink.
    */
  def runToMemorySink(spark: SparkSession, dir: String, sinkName: String) = {
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    hourly(stream).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .start()
  }
}
