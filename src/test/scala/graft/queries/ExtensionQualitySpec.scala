package graft.queries

import graft.SparkTestSession
import graft.operators.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the data-quality / curation entries (x74–x81) on
  * toy data — the oracle gate proves fixture equivalence; these pin the
  * semantics on inputs small enough to check by hand.
  */
class ExtensionQualitySpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("qdocs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // events fixture is read with nanosAsLong → `ts` is an epoch-nano BIGINT.
  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("qev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("columnProfile counts nulls and exact distincts per column in one pass") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None), (Some(2), Some("b")), (None, Some("b"))
    ).toDF("x", "y")
    val out = Profile.columnProfile(df, Seq("x", "y"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("x") shouldBe ((1L, 2L)) // one null; distinct {1, 2}
    out("y") shouldBe ((1L, 2L)) // one null; distinct {a, b}
  }

  test("constraintAudit: NULL predicate rows are non-violations; rates are per-rule") {
    val df = Seq(Some(5), Some(50), None, Some(7)).toDF("v")
    val out = Profile.constraintAudit(df, Seq(
      "v_le_10" -> (col("v") > 10),   // violated by 50 only; NULL row passes
      "v_not_null" -> col("v").isNull))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("v_le_10") shouldBe ((1L, 4L))
    out("v_not_null") shouldBe ((1L, 4L))
  }

  test("kAnonymity reports groups and rows below each k") {
    // QI groups: (u1,a)=3 rows, (u1,b)=1, (u2,a)=2 → below k=2: 1 group/1 row;
    // below k=5: all 3 groups / 6 rows.
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "a"))
      .toDF("u", "t")
    val out = Profile.kAnonymity(df, Seq("u", "t"), Seq(2, 5))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out(2) shouldBe ((3L, 1L, 1L))
    out(5) shouldBe ((3L, 3L, 6L))
  }

  test("x77: a value far outside the fences is counted, fences come from milli-units") {
    // 9 values at 1.0..9.0 and one at 1000.0 for type 'a': q1/q3 over
    // integral millis, hi fence well under 1000000 → exactly one n_above.
    val rows = (1 to 9).map(i => (i.toLong, i.toLong * 1000000000L, 1L, "a", i.toDouble, "{}")) :+
      (10L, 10L * 1000000000L, 1L, "a", 1000.0, "{}")
    val tmp = writeEvents(rows)
    val r = entry("x77_iqr_outliers").build(spark, tmp).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_above") shouldBe 1L
    r.head.getAs[Long]("n_below") shouldBe 0L
    r.head.getAs[Long]("n_total") shouldBe 10L
  }

  test("x78: longest same-type run wins, ordered by event time") {
    // user 1: a a a b b → best streak (a, 3). user 2: b a → ties of length 1
    // break on max event_type → (b, 1).
    val tmp = writeEvents(Seq(
      (1L, 1000L, 1L, "a", 0.0, "{}"),
      (2L, 2000L, 1L, "a", 0.0, "{}"),
      (3L, 3000L, 1L, "a", 0.0, "{}"),
      (4L, 4000L, 1L, "b", 0.0, "{}"),
      (5L, 5000L, 1L, "b", 0.0, "{}"),
      (6L, 1000L, 2L, "b", 0.0, "{}"),
      (7L, 2000L, 2L, "a", 0.0, "{}")))
    val out = entry("x78_event_streaks").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("best_len"), r.getAs[String]("best_type"))).toMap
    out(1L) shouldBe ((3L, "a"))
    out(2L) shouldBe ((1L, "b"))
  }

  test("x79: quotas cap the take; strata outside the mixture drop out") {
    // 5 'en' docs (want 80 → take all 5), 1 'es' doc (not in mixture → absent).
    val tmp = writeDocs((1L to 5L).map(i => (i, s"doc $i", "en", "s", 5L)) :+
      (9L, "adios", "es", "s", 5L))
    val out = entry("x79_mixture_budget").build(spark, tmp).collect()
    out.map(_.getAs[String]("lang")).toSet shouldBe Set("en")
    val en = out.head
    en.getAs[Long]("n_have") shouldBe 5L
    en.getAs[Long]("n_taken") shouldBe 5L
    en.getAs[Long]("id_checksum") shouldBe 15L // all five picked: 1+2+3+4+5
  }

  test("x80: with no bucket collisions the linear-count estimate is exact") {
    // tiny shingle sets: filled buckets == distinct shingles, and
    // -m·ln(1-b/m) rounds back to b for b ≪ m=65536.
    val tmp = writeDocs(Seq(
      (1L, "a b c d e", "en", "s1", 9L),
      (2L, "f g h i j", "en", "s2", 9L)))
    entry("x80_linear_count_distinct").build(spark, tmp).collect().foreach { r =>
      r.getAs[Long]("est_distinct") shouldBe r.getAs[Long]("exact_distinct")
      r.getAs[Double]("err_pct") shouldBe 0.0
    }
  }

  test("x82: P75 cutoff splits 3/1 and flags the user straddling it") {
    // tsu µs = 1,2,3,4 → cutoff = 3.25; user 1 fully in train, user 2 has
    // one event each side → users_both = 1, leakage 0.5.
    val tmp = writeEvents(Seq(
      (1L, 1000L, 1L, "a", 0.0, "{}"),
      (2L, 2000L, 1L, "a", 0.0, "{}"),
      (3L, 3000L, 2L, "a", 0.0, "{}"),
      (4L, 4000L, 2L, "a", 0.0, "{}")))
    val r = entry("x82_temporal_split").build(spark, tmp).collect().head
    r.getAs[Long]("n_train") shouldBe 3L
    r.getAs[Long]("n_test") shouldBe 1L
    r.getAs[Long]("users_both") shouldBe 1L
    r.getAs[Double]("leakage_rate") shouldBe 0.5
  }

  test("x83: a Lloyd round corrects a mislabeled vector and empties its seed cluster") {
    // Two tight groups at ±0.4; vec 5 sits in group A but is labeled 1.
    // Its seed cluster's centroid is pulled toward A, and after one
    // refinement every A-member lands in cluster 0 (argmin ties break low).
    import graft.operators.KMeans
    val a = Array.fill(4)(0.4f)
    val b = Array.fill(4)(-0.4f)
    val tmp = java.nio.file.Files.createTempDirectory("qemb").toString
    Seq(
      (1L, a, 0), (2L, a, 0), (3L, a, 0),
      (4L, b, 1), (5L, a, 1), // 5 is mislabeled: an A-point seeded into B
      (6L, b, 1), (7L, b, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val emb = spark.read.parquet(s"$tmp/embeddings.parquet")
    val out = KMeans.summary(emb, iters = 2)
      .collect().map(r => r.getAs[Int]("cluster") ->
        (r.getAs[Long]("n_members"), r.getAs[Long]("id_checksum"))).toMap
    out(0) shouldBe ((4L, 1L + 2L + 3L + 5L)) // vec 5 reassigned to the A cluster
    out(1) shouldBe ((3L, 4L + 6L + 7L))
  }

  test("x85: a dangling child key is counted as an orphan on its leg only") {
    val tmp = java.nio.file.Files.createTempDirectory("qfk").toString
    Seq((1L, 10L, 20L), (2L, 10L, 20L), (99L, 10L, 20L)) // orderkey 99 dangles
      .toDF("l_orderkey", "l_partkey", "l_suppkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    Seq((1L, 5L), (2L, 5L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$tmp/orders.parquet")
    Seq(Tuple1(10L)).toDF("p_partkey").write.parquet(s"$tmp/part.parquet")
    Seq(Tuple1(20L)).toDF("s_suppkey").write.parquet(s"$tmp/supplier.parquet")
    Seq(Tuple1(5L)).toDF("c_custkey").write.parquet(s"$tmp/customer.parquet")
    val out = entry("x85_referential_integrity").build(spark, tmp)
      .collect().map(r => r.getAs[String]("relation") -> r.getAs[Long]("n_orphans")).toMap
    out("lineitem.orderkey->orders") shouldBe 1L
    out("lineitem.partkey->part") shouldBe 0L
    out("lineitem.suppkey->supplier") shouldBe 0L
    out("orders.custkey->customer") shouldBe 0L
  }

  test("x86: a doc with overwhelming weight races to the front") {
    // key = -ln(u)/w: w=1e9 shrinks any draw below the w=1 competitors'
    val tmp = writeDocs(Seq(
      (1L, "big", "en", "s", 1000000000L),
      (2L, "a", "en", "s", 1L),
      (3L, "b", "en", "s", 1L),
      (4L, "c", "en", "s", 1L)))
    val out = entry("x86_weighted_sample").build(spark, tmp).collect()
    out.head.getAs[Long]("doc_id") shouldBe 1L
    out.length shouldBe 4
  }

  test("x87: trigram candidates without the actual substring are verified away") {
    // doc 2 contains every trigram of 'table part' ('table par art' covers
    // tab/abl/ble/'le '/'e p'/' pa'/par/art) but not the substring itself —
    // it must survive the index probe and die in the contains() verify.
    val tmp = writeDocs(Seq(
      (1L, "x table part y", "en", "s", 14L),
      (2L, "table par art", "en", "s", 13L),
      (3L, "nothing here", "en", "s", 12L)))
    val out = entry("x87_trigram_search").build(spark, tmp)
      .collect().map(_.getAs[Long]("doc_id"))
    out.toSeq shouldBe Seq(1L)
  }

  test("x88: dup rate and language entropy are computed per source") {
    // s1: 3 docs, two identical → dup_rate 1/3, one lang → entropy 0.
    // s2: 2 docs, 50/50 langs → entropy = 2·round(0.5·ln2·1e6) = 693148.
    val tmp = writeDocs(Seq(
      (1L, "same text", "en", "s1", 9L),
      (2L, "same text", "en", "s1", 9L),
      (3L, "other text", "en", "s1", 10L),
      (4L, "un texte", "fr", "s2", 8L),
      (5L, "a text", "en", "s2", 6L)))
    val out = entry("x88_dataset_card").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("dup_rate"),
          r.getAs[Long]("lang_entropy_micro"))).toMap
    out("s1")._1 shouldBe 3L
    out("s1")._2 shouldBe (1.0 / 3.0)
    out("s1")._3 shouldBe 0L
    out("s2")._3 shouldBe 693148L
  }

  test("x89: a user active on days 0 and 2 fills the (0, 2) retention cell") {
    val day = 86400000000000L // ns
    val tmp = writeEvents(Seq(
      (1L, 0L, 1L, "a", 0.0, "{}"), // user 1: day 0 only
      (2L, 0L, 2L, "a", 0.0, "{}"), // user 2: days 0 and 2
      (3L, 2 * day, 2L, "a", 0.0, "{}")))
    val out = entry("x89_retention_cohorts").build(spark, tmp)
      .collect().map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("offset_days")) ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("retention_rate"))).toMap
    out((0L, 0L)) shouldBe ((2L, 1.0))
    out((0L, 2L)) shouldBe ((1L, 0.5))
    out.keySet shouldBe Set((0L, 0L), (0L, 2L))
  }

  test("x90: half-overlapping neighbor batches score jaccard 1/3") {
    // batch 0 (doc 0-99): tokens {a b}; batch 1 (100-199): {b c} → 1/3
    val tmp = writeDocs(Seq(
      (1L, "a b", "en", "s", 3L),
      (150L, "b c", "en", "s", 3L)))
    val r = entry("x90_vocab_drift").build(spark, tmp).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_inter") shouldBe 1L
    r.head.getAs[Double]("jaccard") shouldBe (1.0 / 3.0)
  }

  test("x91: recall is bounded and covers every query vector") {
    val out = entry("x91_ann_recall").build(spark, SparkTestSession.sf0001).collect()
    out.length shouldBe 10 // one row per query vector, zero-hit queries included
    out.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      hits should (be >= 0L and be <= 5L)
      r.getAs[Double]("recall") shouldBe hits / 5.0
    }
  }

  test("x92: near-identical docs form a truth pair and LSH finds it") {
    // docs 1/2 share all but one token (jaccard of shingle sets ≥ 0.5);
    // doc 3 is unrelated → n_truth = n_found = 1, recall 1.0
    val tmp = writeDocs(Seq(
      (1L, "a b c d e f g h", "en", "s", 15L),
      (2L, "a b c d e f g z", "en", "s", 15L),
      (3L, "q r s t u v w x", "en", "s", 15L)))
    val r = entry("x92_lsh_dedup_recall").build(spark, tmp).collect().head
    r.getAs[Long]("n_truth") shouldBe 1L
    r.getAs[Long]("n_found") shouldBe 1L
    r.getAs[Double]("recall") shouldBe 1.0
  }

  test("x93: the CMS inner product never underestimates the self-join size") {
    // 3 users with 3/2/1 events → exact Σc² = 14; the estimate upper-bounds it
    val rows = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L)).zipWithIndex.map {
      case (u, i) => (i.toLong, i.toLong * 1000L, u, "a", 0.0, "{}")
    }
    val tmp = writeEvents(rows)
    val r = entry("x93_join_size_sketch").build(spark, tmp).collect().head
    r.getAs[Long]("exact_size") shouldBe 14L
    r.getAs[Long]("est_size") should be >= 14L
    r.getAs[Double]("over_ratio") should be >= 1.0
  }

  test("x94: a single spike day is flagged against a flat baseline") {
    // type 'a': 7 days at 2 events, day 7 at 6 events → med 2, MAD 0,
    // only the spike exceeds 3×MAD
    val day = 86400000000000L
    val rows = (0 until 7).flatMap(d =>
      Seq.tabulate(2)(j => ((d * 10 + j).toLong, d * day + j * 1000L, 1L, "a", 0.0, "{}"))) ++
      Seq.tabulate(6)(j => ((700 + j).toLong, 7 * day + j * 1000L, 1L, "a", 0.0, "{}"))
    val out = entry("x94_anomaly_days").build(spark, writeEvents(rows)).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("day") shouldBe 7L
    out.head.getAs[Long]("n") shouldBe 6L
  }

  test("x95: distinct lengths calibrate to a flat decile histogram") {
    val tmp = writeDocs((1L to 20L).map(i => (i, "t", "en", "s", 100L + i)))
    val out = entry("x95_score_calibration").build(spark, tmp)
      .collect().map(r => r.getAs[Int]("decile") -> r.getAs[Long]("n")).toMap
    out.keySet shouldBe (0 to 9).toSet
    out.values.foreach(_ shouldBe 2L) // 20 docs, 10 deciles, uniform by construction
  }

  test("x96: a chunk shared verbatim across docs marks both as boilerplate") {
    // 16-token header shared by docs 1 and 2; doc 2 has a second, unique
    // chunk → ratios 1.0 and 0.5. doc 3 (all unique) is filtered out.
    val header = (1 to 16).map(i => s"h$i").mkString(" ")
    val unique = (1 to 16).map(i => s"u$i").mkString(" ")
    val other = (1 to 16).map(i => s"z$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, header, "en", "s", 10L),
      (2L, s"$header $unique", "en", "s", 10L),
      (3L, other, "en", "s", 10L)))
    val out = entry("x96_boilerplate_ratio").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("boilerplate_ratio"))).toMap
    out(1L) shouldBe ((1L, 1.0))
    out(2L) shouldBe ((1L, 0.5))
    out.keySet shouldBe Set(1L, 2L)
  }

  test("x97: negatives never share the anchor's label and come 3 per anchor") {
    val tmp = java.nio.file.Files.createTempDirectory("qneg").toString
    val vecs = (0L until 20L).map(i => (i, Array.fill(4)(i.toFloat / 20), (i % 4).toInt))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val labelOf = vecs.map(v => v._1 -> v._3).toMap
    val out = entry("x97_negative_sampling").build(spark, tmp).collect()
    out.length shouldBe 15 // 5 anchors × 3 negatives
    out.foreach { r =>
      val a = r.getAs[Long]("anchor_id"); val n = r.getAs[Long]("neg_id")
      labelOf(n) should not be labelOf(a)
    }
    // determinism: a second build returns the identical pair set
    val again = entry("x97_negative_sampling").build(spark, tmp).collect()
    again.map(_.toString).sorted shouldBe out.map(_.toString).sorted
  }

  test("x98: identical halves score PSI 0; a shifted half scores positive") {
    val day = 86400000000000L
    // type 'a': value 1.0 in both halves → all bands identical → PSI 0.
    // type 'b': band 0 in half one, band 9 (value 490) in half two → PSI ≫ 0.
    val rows = Seq(
      (1L, 0L, 1L, "a", 1.0, "{}"), (2L, 20 * day, 1L, "a", 1.0, "{}"),
      (3L, 0L, 1L, "b", 1.0, "{}"), (4L, 20 * day, 1L, "b", 490.0, "{}"))
    val out = entry("x98_psi_drift").build(spark, writeEvents(rows))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("psi_micro")).toMap
    out("a") shouldBe 0L
    out("b") should be > 0L
  }

  test("x99: the Wilson interval brackets the dup rate and shrinks with n") {
    // s1: 4 docs, 1 dup pair → p=0.25; s2: same rate from 8 docs → tighter CI
    val tmp = writeDocs(
      Seq((1L, "aa", "en", "s1", 2L), (2L, "aa", "en", "s1", 2L),
        (3L, "bb", "en", "s1", 2L), (4L, "cc", "en", "s1", 2L)) ++
        (1 to 6).map(i => (10L + i, s"t$i", "en", "s2", 2L)) ++
        Seq((17L, "zz", "en", "s2", 2L), (18L, "zz", "en", "s2", 2L)))
    val out = entry("x99_dup_rate_ci").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("dup_rate"), r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))).toMap
    val (p1, lo1, hi1) = out("s1"); val (p2, lo2, hi2) = out("s2")
    p1 shouldBe 0.25; p2 shouldBe 0.125
    lo1 should be < p1; hi1 should be > p1
    (hi2 - lo2) should be < (hi1 - lo1) // more data, tighter interval
  }

  test("x100: each pipeline stage removes its target; the card counts survivors") {
    // good = 92 distinct tokens + 8 stopwords (quality ≈ 0.97, passes);
    // its verbatim copy dies in exact dedup; "x x x" dies in quality.
    val good = ((1 to 92).map(i => s"w$i") ++ Seq.fill(8)("the")).mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, good, "en", "s", good.length.toLong),
      (2L, good, "en", "s", good.length.toLong),
      (3L, "x x x", "en", "s", 5L)))
    val out = entry("x100_pipeline_card").build(spark, tmp).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("n_docs") shouldBe 1L
    out.head.getAs[Long]("total_tokens") shouldBe 100L
  }

  test("x81: the doc with the rare continuation is the most surprising") {
    // 'a b' appears 3×, 'a c' once → P(c|a)=1/4 ≪ P(b|a)=3/4; doc 4 tops.
    val tmp = writeDocs(Seq(
      (1L, "a b", "en", "s", 3L),
      (2L, "a b", "en", "s", 3L),
      (3L, "a b", "en", "s", 3L),
      (4L, "a c", "en", "s", 3L)))
    val out = entry("x81_doc_surprisal").build(spark, tmp).collect()
    out.head.getAs[Long]("doc_id") shouldBe 4L
    // -ln(1/4)·1e6 = 1386294 micro-nats over one bigram
    out.head.getAs[Long]("avg_surprisal_micro") shouldBe 1386294L
  }
}
