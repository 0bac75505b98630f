package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact dedup at ingest: as document files land, fingerprint
  * the normalized text (native `graft_poly_hash`) and `dropDuplicates` on
  * it — Spark keeps the seen-fingerprint set as streaming state, so a
  * re-delivered or duplicated document never reaches the sink. This is
  * [[graft.operators.Dedup.exact]] as a continuous pipeline stage.
  *
  * State is one i64 per distinct document — bounded and tiny relative to
  * the corpus. For time-bounded retention (dedup only within a window),
  * add `withWatermark` on an event-time column before the dropDuplicates;
  * corpus dedup wants the unbounded form.
  */
object StreamDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def dedupByFingerprint(spark: SparkSession, dir: String, sinkName: String) = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("fp", expr("graft_poly_hash(lower(trim(text)))"))
      .dropDuplicates("fp")
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }

  /** Bounded-state streaming dedup over the EVENTS feed:
    * `dropDuplicatesWithinWatermark` on the idempotency key keeps a seen-key
    * entry only until the watermark passes its event time + the lateness
    * bound, so state is O(keys-per-window), not O(keys-ever) — the form a
    * 100 TB/day at-least-once ingest actually runs (the unbounded
    * [[dedupByFingerprint]] grows state with corpus cardinality; fine for
    * corpus dedup, wrong for an infinite telemetry feed). Re-deliveries
    * inside the bound are dropped even when their timestamps differ —
    * exactly the at-least-once re-delivery shape (same key, jittered time)
    * plain dropDuplicates on (key, time) would let through.
    */
  def dedupEventsWithinWatermark(
      spark: SparkSession, dir: String, sinkName: String,
      lateness: String = "1 hour") = {
    graft.streaming.EventsStream.readEvents(spark, dir)
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", lateness)
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }
}
