package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PrefixSumSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two-pass prefix sum equals the sequential truth regardless of partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(100).toLong))
    val truth = rows.scanLeft(0L)(_ + _._2).tail // inclusive running totals
    for (parts <- Seq(1, 3, 17)) {
      val out = PrefixSum.runningTotal(
          rows.toDF("id", "v").repartition(parts), "id", "v", "cum")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cum")).toMap
      rows.zip(truth).foreach { case ((id, _), t) =>
        withClue(s"parts=$parts id=$id") { out(id) shouldBe t }
      }
    }
  }

  test("non-integral value columns are rejected up front with a clear error") {
    // the Long offset accumulator can't represent fractional totals;
    // silently it would ClassCastException deep in the totals collect
    val df = Seq((1L, 1.5), (2L, 2.5)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      PrefixSum.runningTotal(df, "id", "v", "cum")
    }
    e.getMessage should include("must be integral")
    e.getMessage should include("fixed-point")
  }

  test("NULLs and negatives match window-SUM semantics across partition boundaries") {
    // values include NULLs (skipped by SUM) and negatives (running total
    // is non-monotone — a max-based partition total would be wrong)
    val rnd = new scala.util.Random(29)
    val rows: Seq[(Long, Option[Long])] = Seq.tabulate(500) { i =>
      (i.toLong, if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(21).toLong - 10))
    }
    // sequential truth with window semantics: cum = sum of prior non-nulls
    // incl. self; NULL only before any non-null value exists
    var acc = 0L
    var seen = false
    val truth = rows.map { case (id, v) =>
      v.foreach { x => acc += x; seen = true }
      id -> (if (seen) Some(acc) else None)
    }.toMap
    for (parts <- Seq(1, 7)) {
      val df = rows.map { case (id, v) => (id, v.map(Long.box).orNull) }
        .toDF("id", "v").repartition(parts)
      val out = PrefixSum.runningTotal(df, "id", "v", "cum")
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Long]("cum")).map(_.toLong)).toMap
      rows.foreach { case (id, _) =>
        withClue(s"parts=$parts id=$id") { out(id) shouldBe truth(id) }
      }
    }
  }

  test("runningTotals over two columns matches two nested single-column passes") {
    import spark.implicits._
    val rows = (0L until 500L).map(i =>
      (i, i % 7, (i % 3) - 1)) // second column exercises negatives
    val df = rows.toDF("id", "a", "b")
    val once = PrefixSum.runningTotals(df, "id", Seq("a" -> "ca", "b" -> "cb"))
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toMap
    val nested = PrefixSum.runningTotal(
      PrefixSum.runningTotal(df, "id", "a", "ca"), "id", "b", "cb")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("ca"), r.getAs[Long]("cb"))).toMap
    once shouldBe nested
  }

  test("plan has no single-partition global window") {
    val df = PrefixSum.runningTotal(
      spark.range(1000).selectExpr("id", "id % 7 AS v"), "id", "v", "cum")
    // the window partitions by __pid — a global-order window would show an
    // empty partitionBy (all rows in one window group)
    val plan = df.queryExecution.executedPlan.toString
    plan should include("Window")
    plan should include("__pid")
  }
}
