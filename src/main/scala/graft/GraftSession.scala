package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Session factory + fixture-table loaders.
  *
  * The reference engine (see /root/reference/v1/src/main.rs:118-133) runs 16 fixed
  * tasks over a directory of parquet files; on Spark the equivalent knobs are the
  * shuffle-partition count and the file-split sizing, set here once so every entry
  * point (tests, Verify, Bench) builds the same kind of session.
  */
object GraftSession {

  /** Tuned local session. `cores` drives both parallelism and shuffle width —
    * on a real cluster shuffle.partitions would instead track total executor cores
    * (AQE coalesces the excess at runtime).
    *
    * `extraConf` is applied LAST so callers can override any default above
    * (e.g. force-spill thresholds in tests). Note `getOrCreate` reuses a live
    * session and ignores all configs — conf-sensitive callers (spill tests)
    * must run with no pre-existing session, asserted here to fail loudly
    * rather than silently drop their confs.
    */
  def build(appName: String = "graft", cores: Int = 32,
            extraConf: Map[String, String] = Map.empty): SparkSession = {
    if (extraConf.nonEmpty)
      require(SparkSession.getActiveSession.isEmpty && SparkSession.getDefaultSession.isEmpty,
        s"extraConf ${extraConf.keys.mkString(",")} would be ignored: a SparkSession already exists")
    val builder = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Old-style events fixtures carry TIMESTAMP(NANOS), which Spark has no
      // native type for; read those as epoch-nano BIGINT. Current fixtures are
      // TIMESTAMP(MICROS) — [[normalizeEventTs]] projects them to the same
      // epoch-nano BIGINT so every downstream `ts div …` sees one contract.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark
  }

  /** Loader-level `ts` contract: every table surface exposes `ts` as epoch-nano
    * BIGINT regardless of the fixture's physical parquet unit. TIMESTAMP(NANOS)
    * fixtures already arrive as nano longs (`nanosAsLong`); TIMESTAMP(MICROS)
    * fixtures (the driver's current events.parquet) read as TIMESTAMP_NTZ and
    * are projected here — `unix_micros` under the UTC session timezone, ×1000.
    * One projection at the loader instead of 15+ per-query casts, so a future
    * physical-unit change is again a one-line fix (plus FixtureSchemaSpec's
    * canary diff).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(TimestampType) | Some(TimestampNTZType) =>
        df.withColumn("ts", expr("unix_micros(cast(ts as timestamp)) * 1000"))
      case _ => df // already BIGINT nanos (or no ts column)
    }

  /** Fixture tables live at `{dir}/{name}.parquet` (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))

  // S3 metadata cache: the reference prefetches all 640 footers once and
  // runs every query against them (v1/src/main.rs:118-133). The Spark
  // analog of "cached footers" is a cached *analyzed plan* — schema
  // inference (footer reads) happens once per path, later queries reuse it.
  // Keyed by the session instance, with STOPPED sessions purged lazily on
  // every access. (A WeakHashMap cannot work here: the cached Dataset
  // values strongly reference their owning SparkSession — the key — so
  // the value chain would pin the weak key forever, the exact leak weak
  // keying was meant to prevent.)
  private val tableCache =
    new java.util.IdentityHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()

  /** `table` with the analyzed plan memoized per (live session, path). */
  def cachedTable(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.synchronized {
      val it = tableCache.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      tableCache
        .computeIfAbsent(spark, _ => new java.util.HashMap[String, DataFrame]())
        .computeIfAbsent(s"$dir/$name.parquet",
          path => normalizeEventTs(spark.read.parquet(path)))
    }

  /** All fixture table names (TESTDATA.md). */
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The SQL surface: register every fixture table as a temp view and the
    * graft functions on the session, so `spark.sql("SELECT graft_poly_hash
    * (text) FROM documents ...")` works directly — the way the reference's
    * own analysis corpus is written (the datasets/snowset SQL files).
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    org.apache.spark.sql.graft.GraftFunctions.ensureOptimizations(spark)
    tableNames.foreach { n =>
      val f = new java.io.File(s"$dir/$n.parquet")
      if (f.exists()) cachedTable(spark, dir, n).createOrReplaceTempView(n)
    }
  }
}
