package graft.plans

import graft.SparkTestSession
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftPlans
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AsOfJoinPlanSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixtureSides = {
    val ev = graft.GraftSession.table(spark, SparkTestSession.sf0001, "events")
      .withColumn("tsu", expr("ts div 1000"))
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"tsu".as("click_us"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id".as("purch_id"), $"user_id", $"tsu".as("purch_us"))
    (clicks, purchases)
  }

  test("plan-native as-of join matches the union-window formulation on the fixture") {
    val (clicks, purchases) = fixtureSides
    val viaPlan = GraftPlans.asOfJoin(clicks, purchases, "user_id",
        "click_us", "purch_us", Seq("purch_id", "purch_us"), "purch_id")
      .collect().map(_.toSeq).toSet
    val viaWindow = AsOfJoin.lastPrior(clicks, purchases, "user_id",
        "click_us", "purch_us", Seq("purch_id", "purch_us"), "purch_id")
      .collect().map(_.toSeq).toSet
    viaPlan should not be empty
    viaPlan shouldBe viaWindow
  }

  test("physical plan is the custom exec: no window, no nested-loop, no union") {
    val (clicks, purchases) = fixtureSides
    val df = GraftPlans.asOfJoin(clicks, purchases, "user_id",
      "click_us", "purch_us", Seq("purch_id"), "purch_id")
    val plan = df.queryExecution.executedPlan.toString
    plan should include("AsOfJoin") // AsOfJoinExec renders sans Exec suffix
    plan should not include "Window"
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "Union"
  }

  test("equal-time ties take the max tie-break; missing/later rights give NULLs") {
    val left = Seq((1L, 10L, 100L), (2L, 5L, 102L), (3L, 9L, 103L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 10L, 905L), (1L, 10L, 903L), (2L, 6L, 906L))
      .toDF("k", "rt", "rid")
    val out = GraftPlans.asOfJoin(left, right, "k", "t", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    out(100L) shouldBe Some(905L) // inclusive at-or-before, max tie
    out(102L) shouldBe None // right row is later
    out(103L) shouldBe None // key absent on the right
  }

  test("forward as-of via time negation: first at-or-after, max tie-break (x138 shape)") {
    val left = Seq((1L, 10L, 100L), (2L, 5L, 102L), (1L, 13L, 103L))
      .toDF("k", "t", "lid").withColumn("nt", -$"t")
    val right = Seq((1L, 10L, 900L), (1L, 10L, 905L), (1L, 12L, 906L), (2L, 4L, 907L))
      .toDF("k", "rt", "rid").withColumn("nrt", -$"rt")
    val out = GraftPlans.asOfJoin(left, right, "k", "nt", "nrt", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    out(100L) shouldBe Some(905L) // rt=10 ties at-or-after t=10 → max rid
    out(102L) shouldBe None // k=2's only right row is EARLIER (4 < 5)
    out(103L) shouldBe None // no right row at-or-after 13
  }

  test("NULL keys and times never match (SQL semantics)") {
    val left = Seq((Some(1L), Some(10L), 100L), (None, Some(10L), 101L),
        (Some(1L), None, 102L)).toDF("k", "t", "lid")
    val right = Seq((Some(1L), Some(5L), 900L), (None, Some(1L), 901L),
        (Some(1L), None, 902L)).toDF("k", "rt", "rid")
    val out = GraftPlans.asOfJoin(left, right, "k", "t", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    out(100L) shouldBe Some(900L)
    out(101L) shouldBe None // null left key
    out(102L) shouldBe None // null left time
  }

  test("string keys: cached key survives iterator buffer reuse") {
    // Regression: lastKey was cached without copying; for buffer-backed key
    // types (UTF8String) the sorted iterator overwrites it on the next
    // right row, so stale payloads attached to the WRONG key. Long keys
    // (all other specs) never trip this. Many keys per partition + a right
    // row stream that keeps advancing is exactly the reuse shape.
    val rnd = new scala.util.Random(11)
    // > 2000 rows per sort partition so the session's forced-spill
    // threshold kicks in and the right iterator reads through the
    // buffer-reusing spill reader
    val left = Seq.tabulate(3000)(i =>
      (s"user_${rnd.nextInt(40)}", rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(6000)(i =>
      (s"user_${rnd.nextInt(40)}", rnd.nextInt(1000).toLong, (10000 + i).toLong))
    val out = GraftPlans.asOfJoin(
        left.toDF("k", "t", "lid").repartition(1),
        right.toDF("k", "rt", "rid").repartition(1),
        "k", "t", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    left.foreach { case (k, t, lid) =>
      val expected = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      withClue(s"left ($k, $t, $lid)") { out(lid) shouldBe expected }
    }
  }

  test("randomized equivalence against a driver-side oracle") {
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(400)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val right = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, (10000 + i).toLong))
    val out = GraftPlans.asOfJoin(
        left.toDF("k", "t", "lid").repartition(7),
        right.toDF("k", "rt", "rid").repartition(3),
        "k", "t", "rt", Seq("rid"), "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong)).toMap
    left.foreach { case (k, t, lid) =>
      val expected = right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      withClue(s"left ($k, $t, $lid)") { out(lid) shouldBe expected }
    }
  }
}
