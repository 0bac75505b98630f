package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-6 entries (x60–x65) on toy data plus
  * structural checks at sf0.001 — the oracle gate proves fixture
  * equivalence; these pin the *semantics* on inputs small enough to check
  * by hand.
  */
class ExtensionRound6Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r6docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  // events fixture is read with nanosAsLong, so `ts` arrives as an epoch-nano
  // BIGINT — toy data writes it as a plain long directly.
  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r6ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("x60: a doc repeating only earlier shingles scores 0, the first doc scores 1") {
    // doc 1: shingles {abc, bcd} — both first here → novelty 1.
    // doc 2: {abc} again plus {bce} → 1 of 2 novel → 0.5.
    // doc 3: exactly doc 1's text → 0 novel shingles → 0.
    val tmp = writeDocs(Seq(
      (1L, "a b c d", "en", "s", 7L),
      (2L, "a b c e", "en", "s", 7L),
      (3L, "a b c d", "en", "s", 7L)))
    val out = entry("x60_shingle_novelty").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))).toMap
    out(1L) shouldBe ((2L, 2L, 1.0))
    out(2L) shouldBe ((2L, 1L, 0.5))
    out(3L) shouldBe ((2L, 0L, 0.0))
  }

  test("x60: docs shorter than the shingle width drop out of the report") {
    val tmp = writeDocs(Seq(
      (1L, "a b", "en", "s", 3L),
      (2L, "a b c", "en", "s", 5L)))
    val ids = entry("x60_shingle_novelty").build(spark, tmp)
      .select("doc_id").as[Long].collect()
    ids.toSeq shouldBe Seq(2L)
  }

  test("x61: dominated users are dropped, incomparable users survive") {
    // user 1: 3 events, vm 300  — dominated by user 3 (4 events, vm 400)
    // user 2: 1 event,  vm 900  — survives (highest value)
    // user 3: 4 events, vm 400  — survives (most events)
    val evs = Seq(
      (1L, 1L, 1L, "a", 0.1, "{}"), (2L, 2L, 1L, "a", 0.1, "{}"), (3L, 3L, 1L, "a", 0.1, "{}"),
      (4L, 1L, 2L, "a", 0.9, "{}"),
      (5L, 1L, 3L, "a", 0.1, "{}"), (6L, 2L, 3L, "a", 0.1, "{}"),
      (7L, 3L, 3L, "a", 0.1, "{}"), (8L, 4L, 3L, "a", 0.1, "{}"))
    val tmp = writeEvents(evs)
    val out = entry("x61_skyline").build(spark, tmp)
      .select("user_id").as[Long].collect().toSet
    out shouldBe Set(2L, 3L)
  }

  test("x61: exact ties keep only the lowest user_id") {
    val evs = Seq(
      (1L, 1L, 7L, "a", 0.2, "{}"),
      (2L, 1L, 9L, "a", 0.2, "{}")) // identical (1 event, vm 200) profile
    val tmp = writeEvents(evs)
    val out = entry("x61_skyline").build(spark, tmp)
      .select("user_id").as[Long].collect().toSeq
    out shouldBe Seq(7L)
  }

  test("x62: runs collapse, versions number changes, intervals chain") {
    // user 1 stream: A A B A → 3 runs; valid_to of run k = valid_from of k+1.
    val evs = Seq(
      (1L, 1000L, 1L, "A", 0.0, "{}"),
      (2L, 2000L, 1L, "A", 0.0, "{}"),
      (3L, 3000L, 1L, "B", 0.0, "{}"),
      (4L, 4000L, 1L, "A", 0.0, "{}"))
    val tmp = writeEvents(evs)
    val rows = entry("x62_scd2_history").build(spark, tmp).collect()
    rows.length shouldBe 3
    val v = rows.map(r => (r.getAs[Long]("version"), r.getAs[String]("event_type"),
      r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")), r.getAs[Long]("n_events")))
    v(0) shouldBe ((1L, "A", 1L, Some(3L), 2L)) // tsu = ts div 1000
    v(1) shouldBe ((2L, "B", 3L, Some(4L), 1L))
    v(2) shouldBe ((3L, "A", 4L, None, 1L)) // open current run
  }

  test("x63: shares are a probability, skew is share * n_keys, order is hottest-first") {
    val rows = entry("x63_hot_keys").build(spark, dir).collect()
    rows should not be empty
    rows.length should be <= 20
    val counts = rows.map(_.getAs[Long]("cnt"))
    counts.toSeq shouldBe counts.sortBy(-_).toSeq
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      share should (be > 0.0 and be <= 1.0)
      r.getAs[Double]("skew") shouldBe (share * r.getAs[Long]("n_keys")) +- 1e-12
    }
  }

  test("x64: a 3-1 source split gives HHI (9+1)/16; a monoculture gives 1") {
    val tmp = writeDocs(Seq(
      (1L, "t", "en", "s1", 1L), (2L, "t", "en", "s1", 1L), (3L, "t", "en", "s1", 1L),
      (4L, "t", "en", "s2", 1L),
      (5L, "t", "de", "s9", 1L)))
    val out = entry("x64_source_concentration").build(spark, tmp)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("hhi")).toMap
    out("en") shouldBe 0.625 +- 1e-15
    out("de") shouldBe 1.0
  }

  test("x66: a chain within the window collapses to its first event, a gap splits it") {
    // user 1 type A at 0h, 1h, 5h: 0→1h (≤2h, dropped), 1h→5h (>2h, kept)
    val h = 3600L * 1000000000L // ns per hour
    val tmp = writeEvents(Seq(
      (1L, 0L, 1L, "A", 0.0, "{}"),
      (2L, 1L * h, 1L, "A", 0.0, "{}"),
      (3L, 5L * h, 1L, "A", 0.0, "{}")))
    val kept = entry("x66_debounce").build(spark, tmp)
      .select("event_id").as[Long].collect().toSeq
    kept shouldBe Seq(1L, 3L)
  }

  test("x67: a token outside the top-100 vocab counts as OOV, vocab tokens do not") {
    // 100 tokens appearing twice fill the vocab; "rare" (count 1) is OOV.
    val common = (1 to 100).map(i => f"a$i%03d").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, s"$common rare", "en", "s", 1L),
      (2L, common, "en", "s", 1L)))
    val out = entry("x67_oov_rate").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"))).toMap
    out(1L) shouldBe ((101L, 1L))
    out(2L) shouldBe ((100L, 0L))
  }

  test("x68: summary line counts reconcile with the raw parity split") {
    val rows = entry("x68_snapshot_diff").build(spark, dir).collect()
    rows.map(_.getAs[String]("status")).toSet subsetOf
      Set("added", "removed", "changed", "same") shouldBe true
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    rows.map(_.getAs[Long]("lines_a")).sum shouldBe
      li.where($"l_linenumber" % 2 === 1).count()
    rows.map(_.getAs[Long]("lines_b")).sum shouldBe
      li.where($"l_linenumber" % 2 === 0).count()
  }

  test("x69: gaps of 10s and 20s give mean/p50 15s, min 10s, max 20s") {
    val sNs = 1000000000L
    val tmp = writeEvents(Seq(
      (1L, 0L, 1L, "A", 0.0, "{}"),
      (2L, 10L * sNs, 1L, "A", 0.0, "{}"),
      (3L, 30L * sNs, 2L, "A", 0.0, "{}"))) // per-TYPE gaps, users irrelevant
    val r = entry("x69_event_gap_stats").build(spark, tmp).collect().head
    r.getAs[Long]("n_gaps") shouldBe 2L
    r.getAs[Long]("gap_min") shouldBe 10000000L
    r.getAs[Long]("gap_max") shouldBe 20000000L
    r.getAs[Double]("gap_mean") shouldBe 15e6
    r.getAs[Double]("p50") shouldBe 15e6
  }

  test("x70: grouping sets emit lang marginals (gid 1), source marginals (2), total (3)") {
    val tmp = writeDocs(Seq(
      (1L, "t", "en", "s1", 10L), (2L, "t", "en", "s2", 20L), (3L, "t", "de", "s1", 30L)))
    val rows = entry("x70_grouping_sets").build(spark, tmp).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    byGid.keySet shouldBe Set(1L, 2L, 3L)
    byGid(1L).map(r => r.getAs[String]("lang") -> r.getAs[Long]("n")).toMap shouldBe
      Map("en" -> 2L, "de" -> 1L)
    byGid(2L).map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap shouldBe
      Map("s1" -> 2L, "s2" -> 1L)
    byGid(3L).head.getAs[Long]("chars") shouldBe 60L
  }

  test("x71: missing hours appear with zero counts for every type") {
    val h = 3600L * 1000000000L
    val tmp = writeEvents(Seq(
      (1L, 0L, 1L, "A", 0.0, "{}"),
      (2L, 2L * h, 1L, "A", 0.0, "{}"),
      (3L, 1L * h, 1L, "B", 0.0, "{}")))
    val out = entry("x71_dense_timeseries").build(spark, tmp)
      .collect().map(r => (r.getAs[String]("event_type"), r.getAs[Long]("h")) ->
        r.getAs[Long]("n")).toMap
    out shouldBe Map(
      ("A", 0L) -> 1L, ("A", 1L) -> 0L, ("A", 2L) -> 1L,
      ("B", 0L) -> 0L, ("B", 1L) -> 1L, ("B", 2L) -> 0L)
  }

  test("x72: a fully contained shingle set scores containment 1.0 at sub-threshold jaccard") {
    // A's shingles {abc,bcd,cde} ⊂ B's {abc,bcd,cde,def}: cont = 3/3 = 1.0
    // while jac = 3/4 — the asymmetric signal this entry adds over x07.
    val tmp = writeDocs(Seq(
      (1L, "a b c d e", "en", "s", 9L),
      (2L, "a b c d e f", "en", "s", 11L)))
    val rows = entry("x72_containment_dedup").build(spark, tmp).collect()
    rows.length shouldBe 1
    val r = rows.head
    (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) shouldBe ((1L, 2L))
    (r.getAs[Int]("na"), r.getAs[Int]("nb")) shouldBe ((3, 4))
    r.getAs[Double]("cont") shouldBe 1.0
  }

  test("x73: PageRank concentrates score on the shared sink, by hand") {
    // edges 1→11, 2→11, 2→12; N=4, init 250e6, base 150e6//4 = 37.5e6.
    // From iteration 2 on sources hold base only, so s3 is stationary:
    // 11 = 37.5e6 + 31.875e6 + 15.9375e6, 12 = 37.5e6 + 15.9375e6.
    val edges = Seq((1L, 11L), (2L, 11L), (2L, 12L)).toDF("src", "dst")
    val out = graft.operators.PageRank.run(edges, iters = 3)
      .orderBy($"score".desc, $"node")
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("score"))).toSeq
    out shouldBe Seq(
      (11L, 85312500L), (12L, 53437500L), (1L, 37500000L), (2L, 37500000L))
  }

  test("x65: deciles cover 1..10, percent_rank is monotone in length per lang") {
    val rows = entry("x65_length_deciles").build(spark, dir).collect()
    rows.map(_.getAs[Int]("decile")).min shouldBe 1
    rows.map(_.getAs[Int]("decile")).max shouldBe 10
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val byLen = rs.sortBy(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
      val prs = byLen.map(_.getAs[Double]("pr"))
      prs.zip(prs.drop(1)).foreach { case (a, b) => a should be <= b }
      prs.head shouldBe 0.0
      prs.last shouldBe 1.0
    }
  }
}
