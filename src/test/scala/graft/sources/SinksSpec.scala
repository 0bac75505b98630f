package graft.sources

import graft.{GraftSession, SparkTestSession}
import graft.queries.QueryCatalog
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SinksSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("selectivity-distribution result round-trips through the CSV sink (S9)") {
    val li = GraftSession.table(spark, SparkTestSession.sf0001, "lineitem")
    val result = QueryCatalog.selectivityDistribution(li)
    val out = java.nio.file.Files.createTempDirectory("csv-sink").toString
    Sinks.writeCsvSingle(result, out)

    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".csv"))
    files should have length 1 // single file, like COPY TO

    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    back.columns.toSeq shouldBe result.columns.toSeq
    back.count() shouldBe result.count()
    val a = back.orderBy("selectivity_bucket").collect()
      .map(_.getAs[Number](1).longValue) // inferSchema may narrow to int
    val b = result.orderBy("selectivity_bucket").collect()
      .map(_.getAs[Number](1).longValue)
    a.toSeq shouldBe b.toSeq
  }
}
