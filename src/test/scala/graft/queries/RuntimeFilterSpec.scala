package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Runtime bloom-filter semi-join reduction: when a fact table joins a
  * selectively-filtered side, Spark can inject a bloom filter built from
  * the filtered side's join keys into the fact scan, so non-matching fact
  * rows die before the shuffle instead of after it. At 100 TB this is the
  * difference between shuffling the whole fact table and shuffling the
  * ~matching fraction — the runtime analog of the static min/max pruning
  * BytePlanner models, and it composes with AQE.
  *
  * The production thresholds (creation side ≤ 10 MB etc.) are sized for
  * real tables, so the fixture lowers them to force injection — what the
  * spec pins is that the feature fires on this plan SHAPE (selective dim,
  * equi-join, fact scan), not the threshold tuning.
  */
class RuntimeFilterSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  test("selective dim join injects a bloom filter into the fact side") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "true")
      conf.set(keys(1), "100MB") // fixture dims are tiny; keep creation allowed
      conf.set(keys(2), "0")     // fixture fact scans are tiny; allow application
      // force the shuffle-join path: bloom injection exists to protect the
      // shuffle, and the rule skips joins it expects to broadcast — at
      // fixture scale everything broadcasts, so turn that off for the test
      conf.set(keys(3), "-1")
      val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      val dim = spark.read.parquet(s"$dir/orders.parquet")
        .where("o_orderpriority = '1-URGENT'")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan.linesIterator.take(40).mkString("\n")) {
        // InjectRuntimeFilter plants a bloom_filter_might_contain predicate
        // (backed by a BloomFilterAggregate subquery) on the fact scan side
        plan.toLowerCase should include("might_contain")
      }
      // and the reduction is semantics-free: group counts sum to the plain
      // join's row count
      joined.collect().map(_.getLong(1)).sum shouldBe
        fact.join(dim, fact("l_orderkey") === dim("o_orderkey")).count()
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
