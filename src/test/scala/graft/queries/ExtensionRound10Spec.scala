package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-10 statistics entries (x141–x143) on
  * toy data — the oracle gate proves fixture equivalence; these pin the
  * semantics on inputs small enough to check by hand.
  */
class ExtensionRound10Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r10docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r10ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("x141: an exact 1/r frequency ladder fits exponent ~1") {
    // freq(a)=6, freq(b)=3, freq(c)=2 → freq = 6/rank exactly, so the
    // log-log points are collinear with slope −1 up to the milli-unit
    // rounding of each ln.
    val text = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")).mkString(" ")
    val tmp = writeDocs(Seq((1L, text, "en", "s0", text.length.toLong)))
    val out = entry("x141_zipf_fit").build(spark, tmp).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("vocab_n") shouldBe 3L
    out.head.getAs[Double]("zipf_exponent") shouldBe 1.0 +- 0.01
  }

  test("x141: a single-word vocabulary yields a null exponent (zero variance)") {
    val tmp = writeDocs(Seq((1L, "only only only", "en", "s0", 14L)))
    val out = entry("x141_zipf_fit").build(spark, tmp).collect()
    out.length shouldBe 1
    out.head.isNullAt(out.head.fieldIndex("zipf_exponent")) shouldBe true
  }

  test("x142: identical cohort distributions give KS 0, disjoint give KS 1") {
    // alternating users, value cycles half as fast — each cohort sees
    // exactly {0,0,1,1} → KS = 0.
    val same = writeEvents((0L until 8L).map(i =>
      (i, 1000L * i, i % 2, "e", ((i / 2) % 2).toDouble, "{}")))
    val r0 = entry("x142_ks_drift").build(spark, same).collect().head
    r0.getAs[Long]("ks_micro") shouldBe 0L
    // cohort 0 sees values {0,1}, cohort 1 sees {100,101} → at vm=1000·1
    // every g=0 observation has passed and no g=1 has → KS = 1.
    val disjoint = writeEvents((0L until 8L).map(i =>
      (i, 1000L * i, i % 2, "e", if (i % 2 == 0) (i % 4).toDouble else 100.0 + (i % 4), "{}")))
    val r1 = entry("x142_ks_drift").build(spark, disjoint).collect().head
    r1.getAs[Long]("ks_micro") shouldBe 1000000L
  }

  test("x142: a single-cohort fixture yields NULL ks_micro, not a 0-division") {
    // every user_id even → cohort 1 is empty, na·nb = 0; both legs must
    // agree on NULL (Spark's when-guard, the oracle's NULLIF).
    val oneCohort = writeEvents((0L until 6L).map(i =>
      (i, 1000L * i, 2 * i, "e", (i % 3).toDouble, "{}")))
    val r = entry("x142_ks_drift").build(spark, oneCohort).collect().head
    r.isNullAt(r.fieldIndex("ks_micro")) shouldBe true
  }

  test("x143: release is deterministic, bounded, and actually noisy") {
    val tmp = writeEvents((0L until 20L).map(i =>
      (i, 1000L * i, i % 3, if (i % 2 == 0) "click" else "view", 1.0, "{}")))
    val q = entry("x143_dp_release")
    val a = q.build(spark, tmp).collect()
    val b = q.build(spark, tmp).collect()
    a.map(_.toSeq.toList).toList shouldBe b.map(_.toSeq.toList).toList
    // Laplace(b=1) noise is milli-rounded: |noise| ≤ ln(P+1) ≈ 20.7 → the
    // release stays within ±21·1000 milli of the true count, and at least
    // one group's noise must be nonzero (u = ½ exactly has measure ~0).
    val offsets = a.map(r => r.getAs[Long]("released_milli") - 1000L * r.getAs[Long]("n"))
    all(offsets.map(math.abs)) should be <= 21000L
    offsets.exists(_ != 0L) shouldBe true
  }
}
