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

  test("two-pass running min equals the sequential truth, negatives included") {
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(200).toLong - 100L))
    val truth = rows.map(_._2).scanLeft(Long.MaxValue)(math.min).tail
    for (parts <- Seq(1, 3, 17)) {
      val out = PrefixSum.runningMin(
          rows.toDF("id", "v").repartition(parts), "id", "v", "mn")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("mn")).toMap
      rows.map(_._1).zip(truth).foreach { case (id, t) =>
        withClue(s"parts=$parts id=$id") { out(id) shouldBe t }
      }
    }
  }

  test("runningMin NULL semantics: skipped, NULL only before any non-null") {
    val df = Seq[(Long, Option[Long])]((0L, None), (1L, Some(5L)), (2L, None),
      (3L, Some(3L)), (4L, None)).toDF("id", "v")
    val out = PrefixSum.runningMin(df, "id", "v", "mn")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("mn")).map(_.longValue)).toMap
    out(0L) shouldBe None
    out(1L) shouldBe Some(5L)
    out(2L) shouldBe Some(5L)
    out(3L) shouldBe Some(3L)
    out(4L) shouldBe Some(3L)
  }

  test("two-pass running max equals the sequential truth, negatives included") {
    val rnd = new scala.util.Random(19)
    val rows = Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(200).toLong - 100L))
    val truth = rows.map(_._2).scanLeft(Long.MinValue)(math.max).tail
    for (parts <- Seq(1, 3, 17)) {
      val out = PrefixSum.runningMax(
          rows.toDF("id", "v").repartition(parts), "id", "v", "mx")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("mx")).toMap
      rows.map(_._1).zip(truth).foreach { case (id, t) =>
        withClue(s"parts=$parts id=$id") { out(id) shouldBe t }
      }
    }
  }

  test("downward-CUSUM identity: clamped prefix-max minus prefix-sum equals the recursion") {
    // S⁻_i = max(0, S⁻_{i-1} − d_i) rewritten as max(0, max_{j≤i} P_j) − P_i
    val rnd = new scala.util.Random(29)
    val devs = Seq.tabulate(2000)(i => (i.toLong, rnd.nextInt(21).toLong - 10L))
    val truth = devs.map(_._2).scanLeft(0L)((s, d) => math.max(0L, s - d)).tail
    val p = PrefixSum.runningTotals(devs.toDF("id", "d").repartition(7),
      "id", Seq("d" -> "p"))
    val out = PrefixSum.runningMax(p, "id", "p", "mx")
      .selectExpr("id", "greatest(mx, 0L) - p AS cusum_down")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cusum_down")).toMap
    devs.map(_._1).zip(truth).foreach { case (id, t) =>
      withClue(s"id=$id") { out(id) shouldBe t }
    }
  }

  test("CUSUM identity: prefix-sum minus clamped prefix-min equals the recursion") {
    // S_i = max(0, S_{i-1} + d_i) is sequential; x147 computes it as
    // P_i − min(0, min_{j≤i} P_j) — pin the rewrite against the recursion
    val rnd = new scala.util.Random(17)
    val devs = Seq.tabulate(2000)(i => (i.toLong, rnd.nextInt(21).toLong - 10L))
    val truth = devs.map(_._2).scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
    val p = PrefixSum.runningTotals(devs.toDF("id", "d").repartition(7),
      "id", Seq("d" -> "p"))
    val out = PrefixSum.runningMin(p, "id", "p", "mn")
      .selectExpr("id", "p - least(mn, 0L) AS cusum")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("cusum")).toMap
    devs.map(_._1).zip(truth).foreach { case (id, t) =>
      withClue(s"id=$id") { out(id) shouldBe t }
    }
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
