package graft.metrics

import graft.SparkTestSession
import graft.operators.ParquetQuery
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class IoMetricsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val path = s"${SparkTestSession.sf001}/lineitem.parquet"

  private def bytesFor(predicate: String): (Long, IoMetrics.Report) = {
    val q = ParquetQuery(spark, path).where(predicate)
      .aggregate("COUNT(l_quantity)", "SUM(l_quantity)")
    IoMetrics.measure(spark, Seq(path))(q.df.collect().head.getLong(0))
  }

  test("bytes read and selectivity are reported; records match the scan") {
    val (rows, rep) = bytesFor("l_quantity >= 0.0")
    rows should be > 0L
    rep.bytesRead should be > 0L
    rep.physicalBytes should be > 0L
    rep.selectivity should be > 0.0
    // vectorized reader reports the decoded row count
    rep.recordsRead should be > 0L
  }

  test("a predicate that prunes every row group reads fewer bytes (v1 best-case)") {
    val (all, full) = bytesFor("l_extendedprice > 0.0")
    val (none, pruned) = bytesFor("l_extendedprice > 99999999.0")
    all should be > 0L
    none shouldBe 0L
    // stats-based row-group pruning: the empty scan must touch strictly
    // less data than the full scan (footer/metadata only)
    pruned.bytesRead should be < full.bytesRead
  }

  test("throughput metrics derive from bytes and elapsed time") {
    val (_, rep) = bytesFor("l_quantity > 25.0")
    rep.logicalThroughputGBs should be > 0.0
    rep.physicalThroughputGBs should be > 0.0
    rep.toJson should include("\"selectivity\"")
  }
}
