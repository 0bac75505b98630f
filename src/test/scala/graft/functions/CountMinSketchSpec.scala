package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CountMinSketchSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def estimates(keys: Seq[Long], d: Int, w: Int): Map[Long, Long] = {
    val df = keys.toDF("kh")
    val sk = df.agg(CountMinSketch.sketch(col("kh"), d, w).as("sketch"))
    df.distinct().crossJoin(sk)
      .select(col("kh"), CountMinSketch.estimate(col("sketch"), col("kh"), d, w).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("wide sketch with few keys estimates exactly") {
    val keys = Seq.fill(5)(101L) ++ Seq.fill(3)(202L) ++ Seq(303L)
    val est = estimates(keys, d = 4, w = 1024)
    est(101L) shouldBe 5L
    est(202L) shouldBe 3L
    est(303L) shouldBe 1L
  }

  test("estimates never undercount, even under forced collisions") {
    // w=2 forces heavy collisions; CMS must still upper-bound every count
    val keys = (1L to 50L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = estimates(keys, d = 4, w = 2)
    exact.foreach { case (k, n) => est(k) should be >= n }
  }

  test("merge across partitions equals a single-partition fold") {
    val keys = (1L to 200L).map(k => k % 7)
    val one = keys.toDF("kh").coalesce(1)
      .agg(CountMinSketch.sketch(col("kh"), 4, 64)).collect().head.getSeq[Long](0)
    val many = keys.toDF("kh").repartition(8)
      .agg(CountMinSketch.sketch(col("kh"), 4, 64)).collect().head.getSeq[Long](0)
    many shouldBe one
  }
}
