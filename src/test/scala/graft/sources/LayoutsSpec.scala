package graft.sources

import graft.SparkTestSession
import graft.metrics.BytePlanner
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class LayoutsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private lazy val lineitem =
    spark.read.parquet(s"${SparkTestSession.sf001}/lineitem.parquet")

  test("sortedStats layout makes range predicates prune groups AND pages") {
    val dir = java.nio.file.Files.createTempDirectory("layout-sorted").toString
    Layouts.sortedStats(lineitem, dir, Seq("l_extendedprice"),
      groupBytes = 256 * 1024, pageRows = 1000, partitions = 2)
    val pred = "l_extendedprice > 80000.0"
    val rg = BytePlanner.plan(dir, Seq("l_extendedprice"), Some(pred))
    rg.rowGroups should be > 2
    rg.survivingGroups should be < rg.rowGroups
    val pp = BytePlanner.planPages(dir, Seq("l_extendedprice"), pred)
    pp.survivingPages should be < pp.pages
    // and the data itself is intact
    spark.read.parquet(dir).count() shouldBe lineitem.count()
  }

  test("bloomKeys layout lets point probes prune what stats cannot") {
    val dir = java.nio.file.Files.createTempDirectory("layout-bloom").toString
    // write in incoming (unsorted-by-key) order: stats are blind to probes
    Layouts.bloomKeys(lineitem, dir, Seq("l_orderkey"))
    val keys = lineitem.select("l_orderkey").collect().map(_.getLong(0)).toSet
    val absent = (keys.min to keys.max).find(!keys(_)).get
    BytePlanner.planBloom(dir, Seq("l_orderkey"), Some(s"l_orderkey == $absent"))
      .survivingGroups shouldBe 0
    BytePlanner.planBloom(dir, Seq("l_orderkey"), Some(s"l_orderkey == ${keys.head}"))
      .survivingGroups should be > 0
  }
}
