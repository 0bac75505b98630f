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

  /** events.parquet physical schema: the driver's fixture carries
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ. Every transform below still runs on the loader contract
    * (`ts` = epoch-nano BIGINT, see [[graft.GraftSession.normalizeEventTs]]);
    * [[readEvents]] applies the projection right after the source.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over an events directory, normalized to the epoch-nano
    * BIGINT `ts` contract all transforms share with the batch path.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.GraftSession.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))

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
    * in-memory sink. Returns the started query; callers
    * `processAllAvailable()` then read the sink.
    *
    * `outputMode` defaults to `complete` — the memory-sink TEST shape,
    * where every window stays queryable but the watermark never evicts
    * window state (complete mode retains all windows by definition, so
    * state grows with stream lifetime). The bounded-state deployment shape
    * the header describes is `update` (or `append` to an external sink):
    * there the 2-hour watermark actually drops closed windows. Pass
    * `outputMode = "update"` to run that shape against the memory sink —
    * the sink then accumulates per-trigger deltas, latest row per
    * (hour, event_type) wins.
    */
  def runToMemorySink(spark: SparkSession, dir: String, sinkName: String,
      outputMode: String = "complete") = {
    val stream = readEvents(spark, dir)
    hourly(stream).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode(outputMode)
      .start()
  }

  /** Stream-static enrichment: join the event stream against a static
    * dimension on `key`. Spark re-plans the join per micro-batch, so the
    * static side is re-read (and, being dim-sized, broadcast) each
    * trigger — the standard shape for decorating a 100 TB/day event feed
    * with slowly-changing reference data without restarting the query.
    * Left join keeps unmatched events flowing (enrichment must never
    * drop telemetry).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(dim, Seq(key), "left")

  /** [[enrich]] wired end-to-end: file-source stream joined to a static
    * parquet dim, appended to an in-memory sink.
    */
  def runEnrichToMemorySink(
      spark: SparkSession,
      dir: String,
      dimDir: String,
      key: String,
      sinkName: String) = {
    val stream = readEvents(spark, dir)
    enrich(stream, spark.read.parquet(dimDir), key).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }

  /** Gap-based sessionization, batch form: a new session starts when the
    * per-user gap exceeds `gapUs` microseconds. Pure window functions
    * (lag + running sum) over integral microseconds (`ts div 1000` on the
    * loader's epoch-nano contract — DuckDB's `epoch_us` lands on the same
    * µs truncation for both NANOS and MICROS fixtures, so the oracle
    * matches bit-for-bit); `event_id` breaks timestamp ties deterministically.
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

  /** Open-session state: bounded per user — O(1) regardless of stream
    * length (start/end of the one open session + the next session ordinal).
    */
  final case class SessState(startUs: Long, endUs: Long, n: Long, nextId: Long)
  final case class Session(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, duration_us: Long)

  /** Gap-based sessionization as a CONTINUOUS query —
    * `flatMapGroupsWithState` with an event-time timeout, the streaming
    * dual of the batch [[sessionize]]: a session closes (and emits) when a
    * later event arrives past the gap, or when the watermark passes the
    * session end + gap (timeout), so results stream out while per-user
    * state stays one open session. The batch form replays history; this
    * form never re-scans — at 100 TB/day ingest that is the difference
    * between a daily backfill job and a standing query.
    *
    * Within-batch events sort by (ts, event_id), the batch order; late
    * events beyond the watermark are dropped by the engine before the
    * handler runs (standard lateness semantics — the batch job is the
    * reconciliation path, same trade the reference's append-only model
    * makes for files that arrive mid-scan).
    */
  def streamingSessionize(
      spark: SparkSession, dir: String, sinkName: String, gapUs: Long,
      lateness: String = "0 seconds",
      idleRetentionMs: Long = 30L * 24 * 3600 * 1000) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, GroupState, OutputMode}
    val stream = readEvents(spark, dir)
    val handler: (Long, Iterator[(Long, Long, Long, java.sql.Timestamp)], GroupState[SessState]) => Iterator[Session] =
      (user, rows, state) => {
        val evs = rows.toArray.sortBy(e => (e._2, e._3))
        val out = Seq.newBuilder[Session]
        var st = state.getOption.getOrElse(SessState(-1L, -1L, 0L, 1L))
        if (state.hasTimedOut) {
          if (st.n > 0) {
            out += Session(user, st.nextId, st.n, st.startUs, st.endUs, st.endUs - st.startUs)
            // Tombstone: keep only the counter, so the user's NEXT session
            // does not reuse the just-emitted session_id ((user_id,
            // session_id) stays unique in the sink, matching the batch
            // numbering). It expires after idleRetentionMs of further quiet
            // — bounded state; an id restart after a month of silence is
            // the accepted trade vs. state that grows with all users ever.
            state.update(SessState(-1L, -1L, 0L, st.nextId + 1))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idleRetentionMs)
          } else state.remove() // expired tombstone
        } else {
          evs.foreach { case (_, tsu, _, _) =>
            if (st.n == 0L) st = SessState(tsu, tsu, 1L, st.nextId)
            else if (tsu - st.endUs > gapUs) {
              out += Session(user, st.nextId, st.n, st.startUs, st.endUs, st.endUs - st.startUs)
              st = SessState(tsu, tsu, 1L, st.nextId + 1)
            } else st = st.copy(endUs = math.max(st.endUs, tsu), n = st.n + 1)
          }
          state.update(st)
          // close via watermark once no on-time event can extend the session
          state.setTimeoutTimestamp(st.endUs / 1000 + gapUs / 1000 + 1)
        }
        out.result().iterator
      }
    stream
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", lateness)
      // the watermark column must survive into the grouped Dataset for
      // EventTimeTimeout to be allowed; the handler ignores it
      .selectExpr("user_id", "ts div 1000 as tsu", "event_id", "event_time")
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(handler)
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }

  /** Arbitrary stateful streaming: per-user running event count +
    * latest event time via `mapGroupsWithState` — the custom-state path a
    * continuous 100 TB ingest needs (bounded per-key state, Update mode).
    */
  def statefulUserCounts(spark: SparkSession, dir: String, sinkName: String) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stream = readEvents(spark, dir)
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

  /** Stream-stream interval join: each purchase attributed to the same
    * user's signups within the preceding `windowSec` seconds. Watermarks on
    * BOTH sides + the time-range join condition let Spark expire state —
    * the unbounded-state trap a naive stream-stream equi-join hits at
    * 100 TB/day ingest. The same plan runs batch (spec cross-checks).
    */
  def attribution(events: DataFrame, windowSec: Long): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"), col("event_type"),
      timestamp_micros(expr("ts div 1000")).as("t"))
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("t").as("signup_t"), col("event_id").as("signup_id"))
      .withWatermark("signup_t", "1 hour")
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("t").as("purchase_t"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_t", "1 hour")
    signups.join(purchases,
      expr(s"""user_id = p_user AND purchase_t >= signup_t
              |AND purchase_t <= signup_t + interval $windowSec seconds""".stripMargin))
      .select(col("user_id"), col("signup_id"), col("purchase_id"),
        col("signup_t"), col("purchase_t"))
  }

  /** [[attribution]] over a file stream into an append-mode memory sink. */
  def runAttributionToMemorySink(spark: SparkSession, dir: String,
      windowSec: Long, sinkName: String) = {
    val stream = readEvents(spark, dir)
    attribution(stream, windowSec).writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }
}
