package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor: every micro-batch of the events
  * feed is scored against a PERSISTED reference band histogram with the
  * population stability index (x98's formula — 10 fixed value-milli
  * bands, add-one smoothing, integer micro-nat terms), and a per-type
  * ledger row appends to the sink. This is the continuous form of the
  * x142/x98 batch drift gates: the reference is built once per release
  * (like the x117/x139/x144 staged indexes), each trigger reads only the
  * 10-band reference table (broadcast-sized: |types|×10 rows regardless
  * of corpus size) plus its own batch, and nothing accumulates in the
  * stream — O(batch) memory forever.
  *
  * PSI is a property of each batch's composition, so there is no
  * batching-invariance claim here (unlike the ingest audit); the
  * contracts are instead: a batch drawn FROM the reference scores
  * exactly 0, a shifted batch scores positive, and a replayed batch_id
  * overwrites its own ledger slice (at-least-once foreachBatch →
  * idempotent dynamic-partition overwrite, the StreamDedup.auditBatch
  * pattern). StreamDriftSpec pins all three.
  */
object StreamDrift {

  /** 10 fixed value-milli bands (x98's binning — band = value·1000 div
    * 50000), clamped at BOTH ends: x98 runs on the non-negative fixture,
    * but a monitor pointed at an arbitrary feed must not let negative
    * values fall below the 0..9 grid — unclamped they would be counted in
    * the denominators yet carry no band mass, so two entirely-negative
    * distributions would compare as "no drift" no matter how far apart.
    */
  private def banded(events: DataFrame): DataFrame =
    events.select(col("event_type"),
      expr("greatest(least(cast(floor(value * 1000) as bigint) div 50000, 9), 0)")
        .as("band"))

  /** Reference band histogram per event type, written once per release —
    * the q distribution incoming batches are scored against.
    */
  def referenceHistogram(ref: DataFrame, path: String): Unit =
    banded(ref)
      .groupBy("event_type", "band").agg(count(lit(1)).as("c"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** PSI of one micro-batch against the reference, per event type in the
    * UNION of batch and reference types; ledger rows (event_type, n,
    * psi_micro, batch_id) overwrite their own batch_id partition so
    * replays are idempotent. A type the reference has never seen scores
    * against pure smoothing mass (refN = 0) — maximally drifted — and
    * symmetrically a reference type absent from the batch (bn = 0, total
    * disappearance) still emits an alarmed row rather than vanishing from
    * the ledger.
    */
  def psiBatch(
      batch: DataFrame,
      batchId: Long,
      refPath: String,
      ledgerPath: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val refC = spark.read.parquet(refPath)
    val refTot = refC.groupBy("event_type").agg(sum("c").as("refn"))
    // ONE scan of the micro-batch: inside foreachBatch every plan subtree
    // re-reads the trigger's source files, so the band counts are
    // materialized once (they are ≤ |types|×10 rows) and the per-type
    // total is derived from them, not from a second banded() pass
    val bc = banded(batch).groupBy("event_type", "band")
      .agg(count(lit(1)).as("bc")).localCheckpoint()
    val bTot = bc.groupBy("event_type").agg(sum("bc").as("bn"))
    // dense type × band grid over the UNION of batch and reference types:
    // empty bands on either side get smoothed mass, and a reference type
    // that vanishes from the batch entirely — the strongest drift signal —
    // still gets a ledger row (bn = 0, scored against pure smoothing mass,
    // the mirror of a never-seen type's refn = 0)
    val types = bTot.select("event_type")
      .union(refTot.select("event_type")).distinct()
    val grid = types.crossJoin((0L to 9L).toDF("band"))
      .join(broadcast(refTot), Seq("event_type"), "left")
      .join(broadcast(bTot), Seq("event_type"), "left")
      .select(col("event_type"), col("band"),
        coalesce(col("bn"), lit(0L)).as("bn"),
        coalesce(col("refn"), lit(0L)).as("refn"))
    val terms = grid
      .join(broadcast(refC.withColumnRenamed("c", "rc")),
        Seq("event_type", "band"), "left")
      .join(bc, Seq("event_type", "band"), "left")
      .select(col("event_type"), col("bn"),
        ((coalesce(col("rc"), lit(0L)) + 1).cast("double")
          / (col("refn") + 10).cast("double")).as("pa"),
        ((coalesce(col("bc"), lit(0L)) + 1).cast("double")
          / (col("bn") + 10).cast("double")).as("pb"))
      .select(col("event_type"), col("bn"),
        round((col("pa") - col("pb")) * log(col("pa") / col("pb")) * lit(1e6))
          .cast("long").as("term"))
    terms.groupBy("event_type")
      .agg(max("bn").as("n"), sum("term").as("psi_micro"))
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(ledgerPath)
  }

  /** File-source stream over an events directory → per-trigger PSI ledger
    * against the persisted reference.
    */
  def monitor(
      spark: SparkSession,
      dir: String,
      refPath: String,
      ledgerPath: String,
      checkpoint: String) =
    spark.readStream
      .schema(EventsStream.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        psiBatch(batch, batchId, refPath, ledgerPath)
      }
      .start()

  // ---------------------------------------------------------------- KS —

  /** Reference VALUE histogram for the KS gate: exact per-milli-unit
    * bucket counts (vm, c) — x142's value axis, persisted once per
    * release. Unlike the 10-band PSI table this is value-vocabulary-sized
    * (every distinct milli-unit), which is what lets the KS statistic see
    * shape differences the coarse bands wash out; it is still a GROUPED
    * table (one row per distinct value, not per event), so the per-trigger
    * read is bounded by value cardinality, not corpus size.
    */
  def referenceEcdf(ref: DataFrame, path: String): Unit =
    ref.select(floor(col("value") * 1000).cast("long").as("vm"))
      .groupBy("vm").agg(count(lit(1)).as("c"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Two-sample KS distance of one micro-batch against the persisted
    * reference — the x142 construction lifted into the continuous gate:
    * cohort a = reference counts, cohort b = the batch, merged on the
    * union value axis; both ECDFs in ONE range-partitioned prefix-sum
    * pass ([[graft.operators.PrefixSum.runningTotals]], O(P) driver
    * state — never a single-partition global window); numerator
    * |ca·NB − cb·NA| exact in DECIMAL(38,0); the statistic rounded to
    * micro-units as BIGINT (the catalog's determinism recipe, so stream
    * and batch legs agree bit-for-bit). Ledger row (n, ks_micro,
    * batch_id) overwrites its own batch_id partition — idempotent under
    * at-least-once replay, like the PSI ledger. An empty batch yields
    * NULL ks_micro (0-denominator guarded the x142 way).
    */
  def ksBatch(
      batch: DataFrame,
      batchId: Long,
      refPath: String,
      ledgerPath: String): Unit = {
    val spark = batch.sparkSession
    val refC = spark.read.parquet(refPath)
    val bC = batch.select(floor(col("value") * 1000).cast("long").as("vm"))
      .groupBy("vm").agg(count(lit(1)).as("c")).localCheckpoint()
    val merged = refC.select(col("vm"), col("c").as("a"), lit(0L).as("b"))
      .unionByName(bC.select(col("vm"), lit(0L).as("a"), col("c").as("b")))
      .groupBy("vm").agg(sum("a").as("a"), sum("b").as("b"))
    val run = graft.operators.PrefixSum.runningTotals(
      merged, "vm", Seq("a" -> "ca", "b" -> "cb"))
    val tot = merged.agg(sum("a").as("na"), sum("b").as("nb"))
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(19,0)")
    run.crossJoin(broadcast(tot))
      .select(col("na"), col("nb"),
        abs(dec(col("ca")) * dec(col("nb"))
          - dec(col("cb")) * dec(col("na"))).as("d"))
      .groupBy("na", "nb").agg(max(col("d")).cast("decimal(38,0)").as("ks_num"))
      .select(col("nb").as("n"),
        when(dec(col("na")) * dec(col("nb")) =!= 0,
          round(col("ks_num").cast("double")
            / (dec(col("na")) * dec(col("nb"))).cast("double") * 1e6))
          .cast("long").as("ks_micro"))
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(ledgerPath)
  }

  /** The KS gate's ALARM contract: the batches whose ks_micro crossed the
    * operator's threshold. An alarm is a deterministic VIEW over the
    * idempotent ledger — not a side effect raised at write time — so
    * replaying a batch (at-least-once delivery) overwrites its ledger
    * slice and re-derives the identical alarm set; an alarm can never be
    * duplicated or lost to redelivery. The threshold is in the ledger's
    * own micro-units (e.g. 100000 = KS distance 0.1); a NULL ks_micro
    * (empty batch) never alarms — no data is not drift.
    */
  def ksAlarms(spark: SparkSession, ledgerPath: String, thresholdMicro: Long): DataFrame =
    spark.read.parquet(ledgerPath)
      .where(col("ks_micro") >= thresholdMicro)
      .select(col("batch_id"), col("n"), col("ks_micro"))
      .orderBy("batch_id")

  /** File-source stream → per-trigger KS ledger against the persisted
    * value histogram. Each batch is scored independently against the
    * reference (no cross-batch state), so the stream leg is the batch
    * leg per trigger — StreamDriftSpec pins stream ≡ batch exactly.
    */
  def monitorKs(
      spark: SparkSession,
      dir: String,
      refPath: String,
      ledgerPath: String,
      checkpoint: String) =
    spark.readStream
      .schema(EventsStream.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ksBatch(batch, batchId, refPath, ledgerPath)
      }
      .start()

  // -------------------------------------------------------------- CUSUM —

  private def hourly(events: DataFrame): DataFrame =
    graft.GraftSession.normalizeEventTs(events)
      .select(expr("ts div 3600000000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))

  /** Reference RATE for the CUSUM gate: ONE row — the reference window's
    * mean events/hour, floored to an exact integer (x147's dev baseline).
    * The target is FIXED at release time on purpose: a self-updating mean
    * would absorb exactly the gradual shift a sequential detector exists
    * to catch.
    */
  def referenceRate(ref: DataFrame, path: String): Unit =
    hourly(ref).agg(expr("sum(n) div count(1)").as("mean_per_hour"))
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** Append one micro-batch's per-hour counts to the CUSUM ledger,
    * idempotently (batch_id partition overwrite). The ledger IS the
    * hourly series: hours split across triggers re-aggregate at read
    * time, so the stream accumulates exactly the table the batch leg
    * would build — which is what makes [[cusumLedger]] ≡ x147-on-the-
    * concatenated-feed an identity, not an approximation.
    */
  def cusumBatch(batch: DataFrame, batchId: Long, ledgerPath: String): Unit =
    hourly(batch)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(ledgerPath)

  /** The TWO-SIDED CUSUM ledger scored against the fixed reference rate —
    * x147's distributed rewrite (prefix-sum vs clamped prefix-min for the
    * burst side, clamped prefix-max vs prefix-sum for the sustained-drop
    * side, all range-partitioned via PrefixSum, O(P) driver state) over
    * the accumulated hourly series: (h, n, cusum, cusum_down), both ≥ 0,
    * alarm when either crosses the operator's threshold. Hours-sized
    * input, so this runs per trigger or on demand at any corpus scale.
    */
  def cusumLedger(
      spark: SparkSession, ledgerPath: String, refPath: String,
      maxSpanHours: Long = DefaultMaxSpanHours): DataFrame = {
    import graft.operators.PrefixSum
    val mean = spark.read.parquet(refPath)
    val hc0 = spark.read.parquet(ledgerPath).groupBy("h").agg(sum("n").as("n"))
    // densify [min h, max h]: an hour with ZERO events produces no ledger
    // rows, yet it is the strongest possible drop signal — without this a
    // total outage between two live hours contributes nothing to
    // cusum_down and the sustained-drop side never fires. (An outage
    // AFTER the last observed hour is invisible to any ledger-only view —
    // pair with a wall-clock liveness check for that.) Hours-sized, so
    // the dense axis stays cheap at any corpus scale — PROVIDED the span
    // is sane: one poison timestamp (a far-future ts from a corrupt
    // producer) would otherwise make sequence() span billions of hours —
    // Spark errors outright past ~2^31 elements and materializes
    // multi-GB arrays in one task below that, taking down the monitor
    // (ADVICE r12). So the axis is bounded to ±maxSpanHours/2 around the
    // MODAL hour (most events; tie → lowest h — a poison hour cannot be
    // the mode unless it carries the most events, in which case it is
    // the feed, not noise); hours outside the window are quarantined —
    // see [[cusumQuarantine]] — as a data-quality signal, never densified.
    val inWin = plausibleHours(hc0, maxSpanHours)
    val bounds = inWin.agg(min("h").as("h0"), max("h").as("h1"))
    val hc = bounds.where(col("h0").isNotNull)
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(inWin, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
    val dev = hc.crossJoin(broadcast(mean))
      .select(col("h"), col("n"), (col("n") - col("mean_per_hour")).as("dev"))
    val p = PrefixSum.runningTotals(dev, "h", Seq("dev" -> "p"))
    PrefixSum.runningMax(PrefixSum.runningMin(p, "h", "p", "mn"), "h", "p", "mx")
      .select(col("h"), col("n"),
        (col("p") - least(col("mn"), lit(0L))).as("cusum"),
        (greatest(col("mx"), lit(0L)) - col("p")).as("cusum_down"))
  }

  /** Default plausibility window for the densified hour axis: ~114 years
    * of hours. Any sane feed fits with orders-of-magnitude headroom, the
    * dense axis stays ≤ 8 MB of longs per task, and a poison timestamp
    * can no longer blow the sequence() materialization.
    */
  val DefaultMaxSpanHours: Long = 1000000L

  /** (h, n, hm): every ledger hour tagged with the modal anchor hour
    * (most events; ties → lowest h — a 1-row sort-limit, exact,
    * deterministic, broadcast). THE single definition of the
    * plausibility anchor: [[cusumLedger]] keeps hours inside
    * ±maxSpanHours/2 of `hm`, [[cusumQuarantine]] reports the ones
    * outside — both filter THIS frame, so the two legs cannot diverge
    * on the window rule or the tie-break.
    */
  private def hoursWithAnchor(hc0: DataFrame): DataFrame = {
    val anchor = hc0.orderBy(col("n").desc, col("h")).limit(1)
      .select(col("h").as("hm"))
    hc0.crossJoin(broadcast(anchor))
  }

  /** Hours within ±maxSpanHours/2 of the modal hour. */
  private def plausibleHours(hc0: DataFrame, maxSpanHours: Long): DataFrame =
    hoursWithAnchor(hc0)
      .where(abs(col("h") - col("hm")) <= lit(maxSpanHours / 2))
      .select("h", "n")

  /** The data-quality surface for [[cusumLedger]]'s plausibility window:
    * ledger hours OUTSIDE ±maxSpanHours/2 of the modal hour, with their
    * event counts — the rows the monitor refused to densify. Non-empty
    * output means a producer is emitting implausible timestamps; route
    * it to the same alerting as the drift alarms. Deterministic over the
    * idempotent ledger, so replay re-derives the identical quarantine set.
    */
  def cusumQuarantine(
      spark: SparkSession, ledgerPath: String,
      maxSpanHours: Long = DefaultMaxSpanHours): DataFrame = {
    val hc0 = spark.read.parquet(ledgerPath).groupBy("h").agg(sum("n").as("n"))
    hoursWithAnchor(hc0)
      .where(abs(col("h") - col("hm")) > lit(maxSpanHours / 2))
      .select(col("h"), col("n"), col("hm").as("modal_h"))
      .orderBy("h")
  }

  /** The CUSUM gate's ALARM contract: the hours at which either side's
    * statistic crossed the operator's threshold `h` (in the same integer
    * units as the deviations — events per hour), with the crossing side
    * named. Like [[ksAlarms]] this is a deterministic view over the
    * idempotent hourly ledger, so at-least-once replay re-derives the
    * identical alarm set (the ledger re-aggregates the replayed hours and
    * the prefix-sum statistics replay bit-for-bit); a detector that
    * mutated running state at write time would double-count redelivered
    * batches — exactly the failure the ledger design exists to rule out.
    */
  def cusumAlarms(
      spark: SparkSession, ledgerPath: String, refPath: String,
      threshold: Long): DataFrame =
    cusumLedger(spark, ledgerPath, refPath)
      .where(col("cusum") >= threshold || col("cusum_down") >= threshold)
      .select(col("h"), col("n"), col("cusum"), col("cusum_down"),
        when(col("cusum") >= threshold && col("cusum_down") >= threshold, "both")
          .when(col("cusum") >= threshold, "up")
          .otherwise("down").as("side"))
      .orderBy("h")

  /** File-source stream → CUSUM ledger rows per trigger. Unlike the
    * per-batch KS/PSI gates this detector is SEQUENTIAL across triggers
    * (that is its point — small persistent shifts accumulate); the
    * cross-trigger state lives entirely in the idempotent ledger, not in
    * stream memory, so the stream itself stays O(batch).
    */
  def monitorCusum(
      spark: SparkSession,
      dir: String,
      ledgerPath: String,
      checkpoint: String) =
    spark.readStream
      .schema(EventsStream.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cusumBatch(batch, batchId, ledgerPath)
      }
      .start()
}
