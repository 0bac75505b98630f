package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Schema-drift canary: pins the PHYSICAL schema every fixture table reads
  * as under this session's configs, so a driver-side fixture regeneration
  * (e.g. round 8's silent events.ts TIMESTAMP(NANOS) → TIMESTAMP(MICROS)
  * flip, which broke 16 catalog queries + the whole streaming surface with
  * zero direct diagnostics) fails HERE with a one-line expected-vs-actual
  * diff instead of as 16 scattered DATATYPE_MISMATCH analysis errors.
  *
  * Two layers are asserted:
  *   1. the raw `spark.read.parquet` schema (what the fixture physically is);
  *   2. the [[GraftSession.table]] loader contract (what every query sees) —
  *      `events.ts` must ALWAYS surface as epoch-nano BIGINT regardless of
  *      the fixture's parquet timestamp unit.
  */
class FixtureSchemaSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  /** name → (column → expected Spark type), as `dataType.simpleString`.
    * Mirrors TESTDATA.md / the driver's pyarrow writer: int32 → int,
    * timestamp[us] (no tz) → timestamp_ntz under this session's configs.
    */
  private val expectedRaw: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // the round-8 drift column: physically TIMESTAMP(MICROS) today, read as
    // timestamp_ntz; if the driver flips the unit again this line is the
    // single place the diff shows up
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp_ntz",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  private def actual(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString)

  test("fixture directory contains exactly the pinned tables (growth canary)") {
    // A table the driver ADDS is drift too: every pinned table has queries
    // and a schema row here, so an unexpected file must fail loudly — the
    // alternative is a fixture surface silently growing past the canary.
    val onDisk = Option(new java.io.File(SparkTestSession.sf0001).listFiles())
      .getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).toSet
    val pinned = expectedRaw.keySet
    withClue(s"FIXTURE SET DRIFT —\n  unexpected (add to expectedRaw + queries): " +
      s"${(onDisk -- pinned).toSeq.sorted}\n  missing from disk: " +
      s"${(pinned -- onDisk).toSeq.sorted}\n") {
      onDisk shouldBe pinned
    }
  }

  for ((name, want) <- expectedRaw.toSeq.sortBy(_._1))
    test(s"$name.parquet physical schema is pinned (drift canary)") {
      val got = actual(spark.read.parquet(s"${SparkTestSession.sf0001}/$name.parquet"))
      withClue(s"FIXTURE DRIFT in $name.parquet —\n  expected: $want\n  actual:   $got\n") {
        got shouldBe want
      }
    }

  test("loader contract: events.ts surfaces as epoch-nano BIGINT (both fixture units)") {
    val viaLoader = GraftSession.table(spark, SparkTestSession.sf0001, "events")
    viaLoader.schema("ts").dataType.simpleString shouldBe "bigint"
    // nano-scale sanity: fixture timestamps are 2024-era → epoch nanos ~1.7e18;
    // a micros- or millis-scaled long would miss this window by 10^3+
    val (mn, mx) = viaLoader
      .agg(org.apache.spark.sql.functions.min("ts"),
        org.apache.spark.sql.functions.max("ts"))
      .collect().headOption.map(r => (r.getLong(0), r.getLong(1))).get
    mn should be > 1_000_000_000_000_000_000L // > 2001-09 in nanos
    mx should be < 4_000_000_000_000_000_000L // < 2096 in nanos
    // and the raw value round-trips the physical micros exactly
    val rawUs = spark.read.parquet(s"${SparkTestSession.sf0001}/events.parquet")
      .selectExpr("min(unix_micros(cast(ts as timestamp)))")
      .collect().head.getLong(0)
    mn shouldBe rawUs * 1000L
  }

  test("loader contract: a nano-BIGINT events fixture passes through unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("events-nanofix").toString
    GraftSession.table(spark, SparkTestSession.sf0001, "events")
      .limit(100).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val back = GraftSession.table(spark, dir, "events")
    back.schema("ts").dataType.simpleString shouldBe "bigint"
    back.count() shouldBe 100L
  }
}
