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

  test("streaming hourly from INFERRED schema matches the declared-schema path") {
    // round-8 regression shape: the driver regenerated events.parquet with a
    // different timestamp unit and the declared schema went stale. Running
    // the same query from schema inference pins the two paths together — a
    // future physical-type change fails HERE with a schema diff, not as a
    // scattered analysis error.
    val dir = java.nio.file.Files.createTempDirectory("events-infer").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val declared = EventsStream.readEvents(spark, dir).schema
    val prev = spark.conf.getOption("spark.sql.streaming.schemaInference")
    spark.conf.set("spark.sql.streaming.schemaInference", "true")
    try {
      val inferredRaw = spark.readStream.option("maxFilesPerTrigger", "1").parquet(dir)
      // the physical file schema must match what EventsStream declares…
      inferredRaw.schema shouldBe EventsStream.schema
      // …and the normalized stream must match the loader contract
      val inferred = GraftSession.normalizeEventTs(inferredRaw)
      inferred.schema shouldBe declared
      val q = EventsStream.hourly(inferred).writeStream
        .format("memory").queryName("events_hourly_inferred")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val streamed = spark.table("events_hourly_inferred").collect().map(_.toSeq).toSet
        val batch = EventsStream.hourly(
          GraftSession.table(spark, SparkTestSession.sf0001, "events"))
          .collect().map(_.toSeq).toSet
        streamed shouldBe batch
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.schemaInference", v)
      case None => spark.conf.unset("spark.sql.streaming.schemaInference")
    }
  }

  test("stream-static enrichment joins every micro-batch against the dim, keeps misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events-enrich").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val events = GraftSession.table(spark, SparkTestSession.sf0001, "events")
    // static dim covering only even user ids → odd ids must survive with null tier
    val dimDir = java.nio.file.Files.createTempDirectory("events-dim").toString
    val userIds = events.select("user_id").distinct()
      .collect().map(_.getLong(0)).sorted
    userIds.filter(_ % 2 == 0).map(u => (u, s"tier${u % 4}")).toSeq
      .toDF("user_id", "tier").write.mode("overwrite").parquet(dimDir)
    val batch = EventsStream.enrich(events, spark.read.parquet(dimDir), "user_id")
      .groupBy("tier").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap

    val query = EventsStream.runEnrichToMemorySink(
      spark, dir, dimDir, "user_id", "events_enrich_test")
    try {
      query.processAllAvailable()
      val streamed = spark.table("events_enrich_test")
        .groupBy("tier").count()
        .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
      streamed shouldBe batch
      streamed.keySet should contain(None) // unmatched events kept
      streamed.keySet.flatten should not be empty
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

  test("streaming sessionization emits the batch session set once closed") {
    import spark.implicits._
    // deterministic two-file fixture: per-user event times in ascending
    // file order, gaps straddling the 100s session gap; the final watermark
    // event (user 99) pushes every other user's open session past timeout
    val gapUs = 100L * 1000000L
    val dir = java.nio.file.Files.createTempDirectory("events-sess-stream").toString
    def write(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("event_id", "user_id", "sec")
        .selectExpr("event_id",
          "cast(timestamp_micros(sec * 1000000) as timestamp_ntz) AS ts",
          "user_id", "'c' AS event_type", "1.0 AS value", "'{}' AS props")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir-stage/$name")
    // (event_id, user_id, epoch-second)
    write("f1", Seq((1L, 1L, 100L), (2L, 1L, 150L), (3L, 2L, 100L)))
    write("f2", Seq((4L, 1L, 400L), (5L, 2L, 180L), (6L, 99L, 100000L)))
    // f3: user 1 returns AFTER its open session timed out — the tombstone
    // must carry the session counter so the new session gets a fresh id;
    // user 99's later event pushes the watermark to close it
    write("f3", Seq((7L, 1L, 100500L), (8L, 99L, 300000L)))
    new java.io.File(dir).mkdirs()
    def promote(name: String): Unit = {
      val src = new java.io.File(s"$dir-stage/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
    }
    val query = EventsStream.streamingSessionize(spark, dir, "sess_stream_test", gapUs)
    try {
      promote("f1"); query.processAllAvailable()
      promote("f2"); query.processAllAvailable()
      // one more empty pass so the advanced watermark fires the timeouts
      query.processAllAvailable()
      val got = spark.table("sess_stream_test")
        .select("user_id", "n_events", "start_us", "end_us")
        .collect().map(_.toSeq).toSet
      // user 1: (100,150) then gap 250s -> new session (400); user 2: one
      // session (100,180); user 99's own session still open (no later
      // watermark) — everything closed must match the batch truth
      got should contain allOf (
        Seq(1L, 2L, 100000000L, 150000000L),
        Seq(1L, 1L, 400000000L, 400000000L),
        Seq(2L, 2L, 100000000L, 180000000L))
      got.map(_.head) should not contain 99L
      // session ordinals increase in close order per user
      val u1 = spark.table("sess_stream_test").where($"user_id" === 1L)
        .orderBy("session_id").select("start_us").as[Long].collect()
      u1 shouldBe u1.sorted

      // a timeout-closed user that returns must get a FRESH session_id:
      // (user_id, session_id) unique in the sink (regression: state.remove()
      // on timeout dropped the counter and restarted numbering at 1)
      promote("f3"); query.processAllAvailable()
      query.processAllAvailable()
      val u1Sessions = spark.table("sess_stream_test")
        .where($"user_id" === 1L).select("session_id").as[Long].collect()
      u1Sessions.length shouldBe 3
      u1Sessions.distinct.length shouldBe 3
      u1Sessions.max shouldBe 3L
    } finally query.stop()
  }

  test("stream-static broadcast join enriches events without stream-side state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("events-enrich").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    // static dim: user → segment; broadcast every micro-batch, no state
    val dim = (0L until 150L).map(u => (u, s"seg${u % 3}")).toDF("user_id", "segment")
    val stream = spark.readStream.schema(EventsStream.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = stream.join(broadcast(dim), Seq("user_id"), "left")
      .groupBy("segment").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val events = GraftSession.table(spark, SparkTestSession.sf0001, "events")
      val want = events.join(broadcast(dim), Seq("user_id"), "left")
        .groupBy("segment").agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      got shouldBe want
      got.keySet should contain allOf ("seg0", "seg1", "seg2")
      // the stream ran micro-batches (progress recorded)
      (q.lastProgress != null) shouldBe true
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases and matches the batch join") {
    val dir = java.nio.file.Files.createTempDirectory("events-attrib").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val windowSec = 3600L
    val events = GraftSession.table(spark, SparkTestSession.sf0001, "events")
    val batch = EventsStream.attribution(events, windowSec)
      .select("signup_id", "purchase_id").collect().map(_.toSeq).toSet
    batch should not be empty // fixture must exercise the join

    val q = EventsStream.runAttributionToMemorySink(spark, dir, windowSec, "attrib_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("attrib_test")
        .select("signup_id", "purchase_id").collect().map(_.toSeq).toSet
      // append mode emits only watermark-closed matches; everything emitted
      // must be a batch match, and the bulk of the window must have closed
      streamed.subsetOf(batch) shouldBe true
      streamed.size should be > 0
      // state is bounded: the query reports watermark progress
      (q.lastProgress != null) shouldBe true
    } finally q.stop()
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
