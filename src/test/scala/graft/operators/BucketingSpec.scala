package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketed co-located joins — the pre-shuffle strategy for the joins that
  * repeat at 100 TB (fact ⋈ fact on the same key, every day): write both
  * sides bucketed by the join key and the join needs no exchange at all.
  */
class BucketingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("a join between same-key bucketed tables plans no shuffle exchange") {
    // external-table paths (warehouse.dir is static conf; explicit paths
    // keep the metastore default untouched)
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    val li = spark.read.parquet(s"${SparkTestSession.sf0001}/lineitem.parquet")
    val ord = spark.read.parquet(s"${SparkTestSession.sf0001}/orders.parquet")

    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself reads co-located buckets: no Exchange below it
      val joinSection = plan.split("HashAggregate").last
      joinSection should include("SortMergeJoin")
      joinSection should not include "Exchange hashpartitioning(l_orderkey"
      joinSection should not include "Exchange hashpartitioning(o_orderkey"

      // and it is the same answer as the unbucketed join
      val truth = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe truth
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
