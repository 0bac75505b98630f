package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Stats-only aggregates (SURVEY.md §4): MIN/MAX/COUNT answered from
  * parquet footer metadata without decoding data — the capability the
  * reference's v2 engine plans toward but never implements (it stops at
  * byte planning). Spark ships it behind
  * `spark.sql.parquet.aggregatePushdown`; off by default in the graft
  * session for semantic parity, exercised here as the opt-in fast path.
  */
class AggregatePushdownSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val path = s"${SparkTestSession.sf001}/lineitem.parquet"

  test("MIN/MAX/COUNT push down to footer stats and match the decoded truth") {
    val truth = spark.read.parquet(path)
      .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1)))
      .collect().head
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    // stats-only aggregates exist on the DSv2 read path only
    spark.conf.set("spark.sql.sources.useV1SourceList",
      prevV1.split(",").filterNot(_.trim == "parquet").mkString(","))
    try {
      val df = spark.read.parquet(path)
        .agg(min("l_orderkey"), max("l_orderkey"), count(lit(1)))
      val plan = df.queryExecution.executedPlan.toString
      plan should include("PushedAggregation: [MIN(l_orderkey), MAX(l_orderkey), COUNT(*)]")
      df.collect().head shouldBe truth
    } finally {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
    }
  }
}
