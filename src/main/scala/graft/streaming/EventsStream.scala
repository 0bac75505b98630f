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

  /** Gap-based sessionization, batch form: a new session starts when the
    * per-user gap exceeds `gapUs` microseconds. Pure window functions
    * (lag + running sum) over integral microseconds (`ts div 1000` —
    * DuckDB also truncates parquet NANOS to µs, so the oracle matches
    * bit-for-bit); `event_id` breaks timestamp ties deterministically.
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    events
      .withColumn("tsu", expr("ts div 1000"))
      .withColumn("prev_ts", lag("tsu", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("tsu") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("tsu").as("start_us"),
        max("tsu").as("end_us"),
        (max("tsu") - min("tsu")).as("duration_us"))
  }

  final case class UserState(nEvents: Long, maxTs: Long)
  final case class UserCounts(user_id: Long, n_events: Long, max_ts: Long)

  /** Arbitrary stateful streaming: per-user running event count +
    * latest event time via `mapGroupsWithState` — the custom-state path a
    * continuous 100 TB ingest needs (bounded per-key state, Update mode).
    */
  def statefulUserCounts(spark: SparkSession, dir: String, sinkName: String) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stream = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
    stream
      .selectExpr("user_id", "ts")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserCounts](GroupStateTimeout.NoTimeout()) {
        case (user, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(0L, Long.MinValue))
          var n = prev.nEvents
          var mx = prev.maxTs
          rows.foreach { case (_, ts) => n += 1; if (ts > mx) mx = ts }
          state.update(UserState(n, mx))
          UserCounts(user, n, mx)
      }
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("update")
      .start()
  }
}
