package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamDriftSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  private def eventsDf(rows: Seq[(Long, Long, Long, String, Double, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def landParquet(dir: String, name: String,
      rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("drift-stage").toString
    // the file source reads with EventsStream.schema (ts TIMESTAMP_NTZ,
    // the fixture's physical type) — land the toy micros accordingly
    eventsDf(rows)
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("cast(timestamp_micros(ts) as timestamp_ntz)"))
      .coalesce(1).write.mode("overwrite").parquet(stage)
    val src = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  // reference: values spread over two bands for type "click"
  private val refRows = (0L until 40L).map(i =>
    (i, 1000L * i, i % 3, "click", if (i % 2 == 0) 10.0 else 80.0, "{}"))

  test("a batch drawn from the reference scores PSI exactly 0; a shifted batch is positive") {
    val refPath = java.nio.file.Files.createTempDirectory("drift-ref").toString + "/bands"
    StreamDrift.referenceHistogram(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("drift-led").toString + "/ledger"
    StreamDrift.psiBatch(eventsDf(refRows), 0L, refPath, ledger)
    val shifted = refRows.map { case (a, b, c, t, _, p) => (a, b, c, t, 450.0, p) }
    StreamDrift.psiBatch(eventsDf(shifted), 1L, refPath, ledger)
    val led = spark.read.parquet(ledger).collect()
      .map(r => r.getAs[Number]("batch_id").longValue -> r.getAs[Long]("psi_micro")).toMap
    led(0L) shouldBe 0L
    led(1L) should be > 0L
  }

  test("negative-valued distributions cannot hide below the band grid") {
    // both distributions entirely negative: unclamped binning would put
    // zero mass in bands 0..9 on both sides and score PSI 0 for a total
    // shift; the double-ended clamp folds them into band 0 vs the
    // reference's 10.0/80.0 mix, which must register as drift
    val refPath = java.nio.file.Files.createTempDirectory("drift-refn").toString + "/bands"
    StreamDrift.referenceHistogram(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("drift-ledn").toString + "/ledger"
    val negative = refRows.map { case (a, b, c, t, _, p) => (a, b, c, t, -500.0, p) }
    StreamDrift.psiBatch(eventsDf(negative), 0L, refPath, ledger)
    spark.read.parquet(ledger).collect().head.getAs[Long]("psi_micro") should be > 0L
  }

  test("a replayed batch_id overwrites its ledger slice (idempotent under at-least-once)") {
    val refPath = java.nio.file.Files.createTempDirectory("drift-ref2").toString + "/bands"
    StreamDrift.referenceHistogram(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("drift-led2").toString + "/ledger"
    StreamDrift.psiBatch(eventsDf(refRows), 7L, refPath, ledger)
    StreamDrift.psiBatch(eventsDf(refRows), 7L, refPath, ledger) // replay
    val rows = spark.read.parquet(ledger).collect()
    rows.length shouldBe 1
    rows.head.getAs[Long]("psi_micro") shouldBe 0L
  }

  test("a reference type that vanishes from a batch still gets an alarmed ledger row") {
    // total disappearance of "click" is the strongest drift signal — with
    // a batch-only type axis it produced NO ledger row at all; the union
    // axis scores it against pure smoothing mass (bn = 0) instead
    val refPath = java.nio.file.Files.createTempDirectory("drift-refv").toString + "/bands"
    StreamDrift.referenceHistogram(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("drift-ledv").toString + "/ledger"
    val replaced = refRows.map { case (a, b, c, _, v, p) => (a, b, c, "scroll", v, p) }
    StreamDrift.psiBatch(eventsDf(replaced), 0L, refPath, ledger)
    val rows = spark.read.parquet(ledger).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("psi_micro"))).toMap
    rows.keySet shouldBe Set("click", "scroll")
    rows("click")._1 shouldBe 0L // vanished: zero batch observations
    rows("click")._2 should be > 0L // and loudly drifted, not absent
    rows("scroll")._2 should be > 0L // never-seen type alarms as before
  }

  test("KS gate: reference-drawn batch scores 0, disjoint scores 1e6, replay idempotent") {
    val refPath = java.nio.file.Files.createTempDirectory("ks-ref").toString + "/ecdf"
    StreamDrift.referenceEcdf(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("ks-led").toString + "/ledger"
    StreamDrift.ksBatch(eventsDf(refRows), 0L, refPath, ledger)
    // every batch value above every reference value → KS = 1 exactly
    val disjoint = refRows.map { case (a, b, c, t, _, p) => (a, b, c, t, 900.0, p) }
    StreamDrift.ksBatch(eventsDf(disjoint), 1L, refPath, ledger)
    StreamDrift.ksBatch(eventsDf(disjoint), 1L, refPath, ledger) // replay
    val led = spark.read.parquet(ledger).collect()
      .map(r => r.getAs[Number]("batch_id").longValue ->
        (r.getAs[Long]("n"), r.getAs[Long]("ks_micro"))).toMap
    led.size shouldBe 2 // replay overwrote its slice, no duplicate rows
    led(0L) shouldBe ((40L, 0L))
    led(1L) shouldBe ((40L, 1000000L))
  }

  test("KS monitor: stream ledger equals the batch leg per trigger (stream ≡ batch)") {
    val in = java.nio.file.Files.createTempDirectory("ks-in").toString
    val refPath = java.nio.file.Files.createTempDirectory("ks-ref2").toString + "/ecdf"
    StreamDrift.referenceEcdf(eventsDf(refRows), refPath)
    val streamLed = java.nio.file.Files.createTempDirectory("ks-led2").toString + "/ledger"
    val batchLed = java.nio.file.Files.createTempDirectory("ks-led3").toString + "/ledger"
    val ckpt = java.nio.file.Files.createTempDirectory("ks-ckpt").toString
    val b1 = refRows.take(20)
    val b2 = refRows.map { case (a, b, c, t, v, p) => (a, b, c, t, v + 35.0, p) }
    val q = StreamDrift.monitorKs(spark, in, refPath, streamLed, ckpt)
    try {
      landParquet(in, "b1", b1)
      q.processAllAvailable()
      landParquet(in, "b2", b2)
      q.processAllAvailable()
    } finally q.stop()
    // batch leg: the same micro-batches scored directly
    StreamDrift.ksBatch(eventsDf(b1), 0L, refPath, batchLed)
    StreamDrift.ksBatch(eventsDf(b2), 1L, refPath, batchLed)
    def led(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getAs[Number]("batch_id").longValue,
        r.getAs[Long]("n"), r.getAs[Long]("ks_micro"))).toSet
    led(streamLed) shouldBe led(batchLed)
    // and the gate is live: the half-shifted second batch drifted
    led(streamLed).find(_._1 == 1L).get._3 should be > 0L
  }

  test("CUSUM monitor: ledger-derived CUSUM equals the batch leg on the concatenated feed") {
    val in = java.nio.file.Files.createTempDirectory("cu-in").toString
    val refPath = java.nio.file.Files.createTempDirectory("cu-ref").toString + "/rate"
    StreamDrift.referenceRate(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("cu-led").toString + "/ledger"
    val ckpt = java.nio.file.Files.createTempDirectory("cu-ckpt").toString
    // trigger 1: reference-rate traffic; trigger 2: a sustained 3× burst,
    // with one HOUR split across the two triggers (ts overlaps) so the
    // read-time re-aggregation is exercised, not just appended. ts is in
    // MICROS here — landParquet's convention — and the direct batch leg
    // goes through the same TIMESTAMP_NTZ projection so both legs feed
    // normalizeEventTs identically.
    val b1 = (0L until 40L).map(i =>
      (i, 90L * 60L * 1000000L * i / 40L, i % 3, "click", 1.0, "{}"))
    val b2 = (100L until 220L).map(i =>
      (i, 60L * 60L * 1000000L + 90L * 60L * 1000000L * (i - 100L) / 120L,
        i % 3, "click", 1.0, "{}"))
    def eventsNtz(rows: Seq[(Long, Long, Long, String, Double, String)]) =
      eventsDf(rows).withColumn("ts",
        org.apache.spark.sql.functions.expr(
          "cast(timestamp_micros(ts) as timestamp_ntz)"))
    val q = StreamDrift.monitorCusum(spark, in, ledger, ckpt)
    try {
      landParquet(in, "b1", b1)
      q.processAllAvailable()
      landParquet(in, "b2", b2)
      q.processAllAvailable()
    } finally q.stop()
    def led(p: String) = StreamDrift.cusumLedger(spark, p, refPath).collect()
      .map(r => (r.getAs[Long]("h"), r.getAs[Long]("n"),
        r.getAs[Long]("cusum"), r.getAs[Long]("cusum_down"))).toSet
    val streamed = led(ledger)
    // batch leg: one ledger from the concatenated feed, same fixed rate
    val ledger2 = java.nio.file.Files.createTempDirectory("cu-led2").toString + "/ledger"
    StreamDrift.cusumBatch(eventsNtz(b1 ++ b2), 0L, ledger2)
    streamed shouldBe led(ledger2)
    // BOTH directions are live: hour 0 ran below the reference rate
    // (27 < 40 → cusum_down > 0) and the burst drives the upward
    // statistic strictly higher by the last hour
    val byHour = streamed.toSeq.sortBy(_._1)
    byHour.head._4 should be > 0L
    byHour.last._3 should be > byHour.head._3
    byHour.last._3 should be > 0L
  }

  test("CUSUM poison timestamp: quarantined, never densified") {
    // one corrupt far-future event (hour ≈ 2.2e6, epoch-nano ts near
    // Long range) lands in the ledger next to real traffic. Without the
    // plausibility window sequence(h0, h1) would densify millions of
    // hours (and billions for a micros-scaled poison — a multi-GB array
    // in one task, an outright error past 2^31). The guard must (a) keep
    // the monitor alive, (b) score only the modal-hour window, (c)
    // surface the poison hour in the quarantine view.
    val refPath = java.nio.file.Files.createTempDirectory("cu-ref4").toString + "/rate"
    StreamDrift.referenceRate(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("cu-led4").toString + "/ledger"
    val poisonTs = 8_000_000_000_000_000_000L // nanos → hour 2_222_222
    val rows = (0L until 40L).map(i =>
      (i, 90L * 60L * 1000000L * i / 40L, i % 3, "click", 1.0, "{}")) :+
      (999L, poisonTs, 0L, "click", 1.0, "{}")
    StreamDrift.cusumBatch(eventsDf(rows), 0L, ledger)
    val led = StreamDrift.cusumLedger(spark, ledger, refPath).collect()
    val hours = led.map(_.getAs[Long]("h")).toSet
    assert(hours.nonEmpty && hours.max < 1000000L,
      s"poison hour must not enter the dense axis, got max ${hours.max}")
    val q = StreamDrift.cusumQuarantine(spark, ledger).collect()
    q.map(_.getAs[Long]("h")).toSet shouldBe Set(poisonTs / 3600000000000L)
    q.head.getAs[Long]("n") shouldBe 1L
  }

  test("CUSUM replayed batch_id overwrites its ledger slice") {
    val refPath = java.nio.file.Files.createTempDirectory("cu-ref2").toString + "/rate"
    StreamDrift.referenceRate(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("cu-led3").toString + "/ledger"
    StreamDrift.cusumBatch(eventsDf(refRows), 4L, ledger)
    StreamDrift.cusumBatch(eventsDf(refRows), 4L, ledger) // replay
    val n = spark.read.parquet(ledger).agg(
      org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    n shouldBe refRows.length.toLong // counted once, not twice
  }

  test("monitor streams per-trigger ledger rows; a never-seen type alarms loudest") {
    val in = java.nio.file.Files.createTempDirectory("drift-in").toString
    val refPath = java.nio.file.Files.createTempDirectory("drift-ref3").toString + "/bands"
    StreamDrift.referenceHistogram(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("drift-led3").toString + "/ledger"
    val ckpt = java.nio.file.Files.createTempDirectory("drift-ckpt").toString
    val q = StreamDrift.monitor(spark, in, refPath, ledger, ckpt)
    try {
      landParquet(in, "b1", refRows)
      q.processAllAvailable()
      // second trigger: half in-distribution clicks, half a type the
      // reference never saw — the unseen type must out-score the known one
      landParquet(in, "b2",
        refRows.take(10) ++ (100L until 110L).map(i =>
          (i, 1000L * i, i % 3, "mystery", 10.0, "{}")))
      q.processAllAvailable()
      // batch_id is a partition directory on read — inference narrows it
      // to int, so unbox numerically
      val led = spark.read.parquet(ledger).collect()
        .map(r => (r.getAs[Number]("batch_id").longValue,
          r.getAs[String]("event_type"), r.getAs[Long]("psi_micro")))
      led.count(_._1 == 0L) shouldBe 1
      led.filter(_._1 == 0L).head._3 shouldBe 0L
      val second = led.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
      second.keySet shouldBe Set("click", "mystery")
      second("mystery") should be > second("click")
    } finally q.stop()
  }

  test("KS alarms: raised under an injected shift, silent under the null, replay-idempotent") {
    val refPath = java.nio.file.Files.createTempDirectory("ksa-ref").toString + "/ecdf"
    StreamDrift.referenceEcdf(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("ksa-led").toString + "/ledger"
    // batch 0: drawn from the reference (KS = 0); batch 1: every value
    // above every reference value (KS = 1 exactly)
    StreamDrift.ksBatch(eventsDf(refRows), 0L, refPath, ledger)
    val shifted = refRows.map { case (a, b, c, t, _, p) => (a, b, c, t, 450.0, p) }
    StreamDrift.ksBatch(eventsDf(shifted), 1L, refPath, ledger)
    def alarms() = StreamDrift.ksAlarms(spark, ledger, thresholdMicro = 100000L)
      .collect().map(r => (r.getAs[Number]("batch_id").longValue,
        r.getAs[Long]("ks_micro"))).toSeq
    alarms() shouldBe Seq((1L, 1000000L)) // the null batch stays silent
    // at-least-once redelivery of the shifted batch: same alarm set, not two
    StreamDrift.ksBatch(eventsDf(shifted), 1L, refPath, ledger)
    alarms() shouldBe Seq((1L, 1000000L))
    // an empty batch writes a NULL ks_micro row and must never alarm
    StreamDrift.ksBatch(eventsDf(Seq.empty), 2L, refPath, ledger)
    alarms() shouldBe Seq((1L, 1000000L))
  }

  test("CUSUM alarms: a sustained burst raises 'up', null traffic is silent, replay-idempotent") {
    val refPath = java.nio.file.Files.createTempDirectory("cua-ref").toString + "/rate"
    StreamDrift.referenceRate(eventsDf(refRows), refPath)
    val ledger = java.nio.file.Files.createTempDirectory("cua-led").toString + "/ledger"
    // refRows land in one hour → reference rate = 40/hour. Batch 0: two
    // hours AT the rate (dev 0 → both statistics 0). Batch 1: two hours at
    // 3× (dev +80/hour accumulates to 160 by hour 3).
    def hoursAt(idBase: Long, firstHour: Long, perHour: Long) =
      (0L until 2 * perHour).map(i => (idBase + i,
        (firstHour + i / perHour) * 3600L * 1000000L + (i % perHour) * 1000L,
        i % 3, "click", 1.0, "{}"))
    StreamDrift.cusumBatch(eventsDf(hoursAt(0L, 0L, 40L))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts) as timestamp_ntz)")), 0L, ledger)
    def alarms(h: Long) = StreamDrift.cusumAlarms(spark, ledger, refPath, h)
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Long]("cusum"),
        r.getAs[String]("side"))).toSeq
    alarms(50L) shouldBe Seq.empty // null traffic: no alarm at any sane h
    StreamDrift.cusumBatch(eventsDf(hoursAt(1000L, 2L, 120L))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts) as timestamp_ntz)")), 1L, ledger)
    alarms(100L) shouldBe Seq((3L, 160L, "up")) // h=100 < 160: hour 3 alarms
    // redelivered burst batch: ledger slice overwritten, alarm set identical
    StreamDrift.cusumBatch(eventsDf(hoursAt(1000L, 2L, 120L))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts) as timestamp_ntz)")), 1L, ledger)
    alarms(100L) shouldBe Seq((3L, 160L, "up"))
  }

  test("a total outage between live hours raises the sustained-drop alarm") {
    val refPath = java.nio.file.Files.createTempDirectory("cuo-ref").toString + "/ref"
    val refRows = (0L until 40L).map(i => (i, i * 1000L, i % 3, "click", 1.0, "{}"))
    StreamDrift.referenceRate(eventsDf(refRows), refPath) // 40 events/hour
    val ledger = java.nio.file.Files.createTempDirectory("cuo-led").toString + "/ledger"
    // hour 0 at the rate, hours 1-3 with ZERO events (the feed died), hour 4
    // at the rate again. The sparse groupBy form would see only hours 0 and
    // 4 (dev 0 each) and never alarm; the densified series accumulates
    // dev = -40 for each silent hour -> cusum_down = 120 by hour 3.
    def hourAt(idBase: Long, hour: Long) =
      (0L until 40L).map(i => (idBase + i,
        hour * 3600L * 1000000L + i * 1000L, i % 3, "click", 1.0, "{}"))
    StreamDrift.cusumBatch(eventsDf(hourAt(0L, 0L) ++ hourAt(1000L, 4L))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "cast(timestamp_micros(ts) as timestamp_ntz)")), 0L, ledger)
    val alarms = StreamDrift.cusumAlarms(spark, ledger, refPath, 100L)
      .collect().map(r => (r.getAs[Long]("h"), r.getAs[Long]("cusum_down"),
        r.getAs[String]("side"))).toSeq.sortBy(_._1)
    alarms shouldBe Seq((3L, 120L, "down"), (4L, 120L, "down"))
  }
}
