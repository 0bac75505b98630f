package graft.operators

import graft.{GraftSession, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SkewSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  private lazy val lineitem =
    GraftSession.table(spark, SparkTestSession.sf0001, "lineitem")

  test("salted aggregation equals the unsalted groupBy (integral sums)") {
    val plain = lineitem
      .groupBy("l_returnflag")
      .agg(sum(col("l_linenumber")).as("sum_l_linenumber"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(lineitem, Seq("l_returnflag"),
      "l_linenumber", col("l_orderkey"), buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    salted shouldBe plain
  }

  test("salted join equals the plain join") {
    val dim = lineitem.groupBy("l_suppkey")
      .agg(max(col("l_extendedprice")).as("max_price"))
    val plain = lineitem.join(dim, Seq("l_suppkey"))
      .agg(count(lit(1)), sum(col("l_linenumber"))).collect().head
    val salted = Skew.saltedEquiJoin(lineitem, dim, "l_suppkey",
      col("l_orderkey"), buckets = 4)
      .agg(count(lit(1)), sum(col("l_linenumber"))).collect().head
    salted.getLong(0) shouldBe plain.getLong(0)
    salted.getLong(1) shouldBe plain.getLong(1)
  }

  test("salting spreads a hot key across buckets in the partial stage") {
    import spark.implicits._
    // one key owns 99% of rows — the shape AQE can't fix for aggregates
    val hot = (1 to 990).map(i => ("hot", i.toLong)) ++ (1 to 10).map(i => (s"k$i", i.toLong))
    val df = hot.toDF("key", "v")
    val partialGroups = df
      .withColumn("__salt", pmod(hash(col("v")), lit(8)))
      .groupBy("key", "__salt").count()
      .where(col("key") === "hot").count()
    partialGroups should be > 4L // hot key split over most of the 8 salts
    Skew.saltedSumCount(df, Seq("key"), "v", col("v"), 8)
      .where(col("key") === "hot").collect().head.getLong(1) shouldBe (1 to 990).map(_.toLong).sum
  }

  test("salted sum refuses a float value column (association would drift)") {
    import spark.implicits._
    val df = Seq(("k", 0.1), ("k", 0.2)).toDF("key", "v")
    an[IllegalArgumentException] should be thrownBy
      Skew.saltedSumCount(df, Seq("key"), "v", col("v"), 8)
  }
}
