package graft.operators

import graft.{GraftSession, SparkTestSession}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs =
    GraftSession.table(spark, SparkTestSession.sf0001, "documents")

  test("binary payload hash equals the text fingerprint on ASCII corpora") {
    // byte-level rolling hash (mapPartitions stub) ≡ char-level rolling hash
    // (codegen'd SQL) — the two paths cross-check each other
    val viaBinary = Multimodal.featurePipeline(spark, docs)
      .select("doc_id", "payload_fp").as[(Long, Long)].collect().toMap
    val viaText = docs.select($"doc_id", TextFunctions.fingerprint("text"))
      .as[(Long, Long)].collect().toMap
    viaBinary shouldBe viaText
  }

  test("featurize preserves row count and schema shape") {
    val out = Multimodal.featurize(Multimodal.asMediaTable(docs))
    out.columns.toSeq shouldBe Seq("doc_id", "media_type", "n_bytes",
      "payload_fp", "width", "height", "feature")
    out.count() shouldBe docs.count()
    val r = out.head()
    r.n_bytes should be > 0L
    r.feature should have length 4
    all(r.feature.toSeq) should (be >= 0.0 and be < 1.0)
  }

  test("featurize is map-side only — no shuffle in the plan") {
    val plan = Multimodal.featurize(Multimodal.asMediaTable(docs))
      .queryExecution.sparkPlan.toString
    plan should not include "Exchange"
  }
}
