package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AsOfJoinSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("picks the latest right row at-or-before each left time, per key") {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L), (3L, 9L, 103L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 15L, 901L), (1L, 30L, 902L), (2L, 6L, 903L))
      .toDF("k", "rt", "rid")
    val out = AsOfJoin.lastPrior(left, right, "k", "t", "rt",
        carry = Seq("rid", "rt"), rightTieBreak = "rid")
      .collect().map(r => r.getAs[Long]("lid") ->
        (Option(r.getAs[java.lang.Long]("asof_rid")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("asof_rt")).map(_.toLong))).toMap
    out(100L) shouldBe (Some(900L), Some(10L)) // tie: at-or-before is inclusive
    out(101L) shouldBe (Some(901L), Some(15L)) // 15 < 20 < 30
    out(102L) shouldBe (None, None) // right row is later, not prior
    out(103L) shouldBe (None, None) // key never on the right
  }

  test("equal-time right rows resolve to the max tie-break, atomically") {
    val left = Seq((1L, 10L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L, "a"), (1L, 10L, 905L, "b"), (1L, 10L, 903L, "c"))
      .toDF("k", "rt", "rid", "tag")
    val row = AsOfJoin.lastPrior(left, right, "k", "t", "rt",
        carry = Seq("rid", "tag"), rightTieBreak = "rid")
      .collect().head
    row.getAs[Long]("asof_rid") shouldBe 905L
    row.getAs[String]("asof_tag") shouldBe "b" // same row's payload, no tearing
  }

  test("NULL in a carried right column does not tear the match to an older row") {
    val left = Seq((1L, 20L, 100L)).toDF("k", "t", "lid")
    val right = Seq((1L, 5L, 900L, java.lang.Long.valueOf(7L)),
        (1L, 10L, 901L, null.asInstanceOf[java.lang.Long]))
      .toDF("k", "rt", "rid", "payload")
    val row = AsOfJoin.lastPrior(left, right, "k", "t", "rt",
        carry = Seq("rid", "payload"), rightTieBreak = "rid")
      .collect().head
    row.getAs[Long]("asof_rid") shouldBe 901L // latest row wins...
    row.isNullAt(row.fieldIndex("asof_payload")) shouldBe true // ...with ITS null, not 7
  }

  test("a string tie-break column orders by its own type, not a nulled long cast") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    // two right rows at the SAME time: the max STRING id must win, every run
    val right = Seq((1L, 100L, "evt-0042", 1L), (1L, 100L, "evt-0099", 2L))
      .toDF("k", "rt", "rid", "payload")
    val row = AsOfJoin.lastPrior(left, right, "k", "t", "rt",
        carry = Seq("rid", "payload"), rightTieBreak = "rid")
      .collect().head
    row.getAs[String]("asof_rid") shouldBe "evt-0099"
  }

  test("a NULL right time is never a phantom prior match") {
    val left = Seq((1L, 5L, 100L)).toDF("k", "t", "lid")
    // the only right row has no timestamp: ascending nulls-first would sort
    // it before every left row and last(ignoreNulls) would carry it — the
    // contract is all-NULL, because no right row truly precedes t = 5
    val right = Seq((1L, Option.empty[Long], 900L)).toDF("k", "rt", "rid")
    val row = AsOfJoin.lastPrior(left, right, "k", "t", "rt",
        carry = Seq("rid"), rightTieBreak = "rid")
      .collect().head
    Option(row.getAs[java.lang.Long]("asof_rid")) shouldBe None
  }
}
