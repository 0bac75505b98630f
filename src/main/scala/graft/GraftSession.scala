package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as epoch-nano BIGINT and bucket with integer division.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark
  }

  /** Fixture tables live at `{dir}/{name}.parquet` (TESTDATA.md). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  // S3 metadata cache: the reference prefetches all 640 footers once and
  // runs every query against them (v1/src/main.rs:118-133). The Spark
  // analog of "cached footers" is a cached *analyzed plan* — schema
  // inference (footer reads) happens once per path, later queries reuse it.
  // Keyed weakly by the session instance itself (identityHashCode values
  // can be reused after GC and would pin plans of stopped sessions forever).
  private val tableCache =
    new java.util.WeakHashMap[SparkSession, java.util.HashMap[String, DataFrame]]()

  /** `table` with the analyzed plan memoized per (live session, path). */
  def cachedTable(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.synchronized {
      tableCache
        .computeIfAbsent(spark, _ => new java.util.HashMap[String, DataFrame]())
        .computeIfAbsent(s"$dir/$name.parquet", path => spark.read.parquet(path))
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
