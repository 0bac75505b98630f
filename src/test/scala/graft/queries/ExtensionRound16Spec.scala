package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-16 entries (x163–x166) on toy data —
  * the oracle gate proves fixture equivalence; these pin the semantics on
  * inputs small enough to check by hand.
  */
class ExtensionRound16Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r16docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, String, Double, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r16ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("x165: hand-computed interpolated Kneser-Ney probabilities") {
    // one doc "a b a b a c": bigrams ab×2, ba×2, ac×1
    //   c(a)=3 with 2 continuations; c(b)=2 with 1; N1+(·,·)=3,
    //   every right word follows exactly 1 distinct left → p_cont = 1/3
    // p_kn(b|a) = (2−.75)/3 + (.75·2/3)(1/3) = 0.58333…
    // p_kn(a|b) = (2−.75)/2 + (.75·1/2)(1/3) = 0.75
    // p_kn(c|a) = (1−.75)/3 + (.75·2/3)(1/3) = 0.25
    val tmp = writeDocs(Seq((1L, "a b a b a c", "en", "s0", 11L)))
    val byPair = entry("x165_kneser_ney").build(spark, tmp).collect()
      .map(r => (r.getString(0) + r.getString(1)) -> r.getAs[Double]("p_kn")).toMap
    byPair("ab") shouldBe (1.25 / 3 + (0.75 * 2 / 3) * (1.0 / 3)) +- 1e-12
    byPair("ba") shouldBe 0.75 +- 1e-12
    byPair("ac") shouldBe 0.25 +- 1e-12
  }

  test("x164: retraction returns exactly the even-half search hits") {
    // docs 2 (even) and 3 (odd) both contain the probe pattern; the odd
    // batch is appended then retracted, so only doc 2 may surface — a
    // leaked odd posting or an over-deleted base both change the row set
    val tmp = writeDocs(Seq(
      (1L, "nothing to see here", "en", "s0", 19L),
      (2L, "scan the table part list", "en", "s0", 24L),
      (3L, "another table part match", "en", "s0", 24L),
      (4L, "also irrelevant text", "en", "s0", 20L)))
    val got = entry("x164_posting_retract").build(spark, tmp)
      .collect().map(_.getLong(0)).toSeq
    got shouldBe Seq(2L)
  }

  test("x166: stream-stream attribution keeps the cross-batch pair and drops out-of-window") {
    val h = 3600L * 1000 * 1000 * 1000 // one hour in nanos
    val t0 = 1700000000L * 1000000000L
    // span t0 .. t0+20h → feed splits at t0+10h. Pairs:
    //   (s1 @t0, p2 @t0+1h)    in-window, same feed batch
    //   (s4 @t0+9h, p5 @t0+11h) in-window, CROSSES the batch boundary —
    //                           pins the watermark never evicts it early
    //   (s1, p3 @t0+8h)        outside the 6 h window → dropped
    val tmp = writeEvents(Seq(
      (1L, t0, 7L, "signup", 0.0, "{}"),
      (2L, t0 + 1 * h, 7L, "purchase", 1.0, "{}"),
      (3L, t0 + 8 * h, 7L, "purchase", 1.0, "{}"),
      (4L, t0 + 9 * h, 9L, "signup", 0.0, "{}"),
      (5L, t0 + 11 * h, 9L, "purchase", 1.0, "{}"),
      (6L, t0 + 20 * h, 9L, "view", 0.0, "{}")))
    val got = entry("x166_stream_attribution").build(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got shouldBe Array(
      (7L, 1L, 2L, 3600L * 1000000),
      (9L, 4L, 5L, 2L * 3600L * 1000000))
  }

  test("x169: watermark eviction drops only the windows closed at the prior watermark") {
    val h = 3600L * 1000 * 1000 * 1000
    val t0 = 1700000000L * 1000000000L
    // batch A (even user): events in hour 0 and hour 10 (max = t0+10.5h →
    // watermark after A = t0+8.5h, so hour windows 0..7 are closed).
    // batch B (odd user): hour-0 row must be EVICTED, hour-9 and hour-10
    // rows absorbed (their windows were still open at t0+8.5h).
    val tmp = writeEvents(Seq(
      (1L, t0 + h / 2, 2L, "view", 1.0, "{}"),
      (2L, t0 + 10 * h + h / 2, 2L, "view", 2.0, "{}"),
      (3L, t0 + 5 * 60 * 1000000000L, 3L, "view", 4.0, "{}"),
      (4L, t0 + 9 * h + h / 4, 3L, "view", 8.0, "{}"),
      (5L, t0 + 10 * h + 2 * h / 3, 3L, "view", 16.0, "{}")))
    val got = entry("x169_stream_late_drop").build(spark, tmp).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // t0 = 2023-11-14 22:13:20 UTC → the three surviving hour buckets are
    // Nov 14 22:00 (A only — B's copy evicted), Nov 15 07:00 (absorbed
    // late row), Nov 15 08:00 (A row + absorbed late row)
    got.map(t => (t._1.substring(11, 13), t._2, t._3, t._4)) shouldBe Array(
      ("22", "view", 1L, 1000L),
      ("07", "view", 1L, 8000L),
      ("08", "view", 2L, 18000L))
  }

  test("x170: the engine's seen-key store swallows re-delivered ids across batches") {
    val tmp = writeDocs(Seq(
      (0L, "t0", "en", "s0", 2L), (1L, "t1", "en", "s1", 2L),
      (2L, "t2", "en", "s0", 2L), (3L, "t3", "en", "s1", 2L),
      (4L, "t4", "en", "s0", 2L), (5L, "t5", "en", "s1", 2L)))
    // residues mod 3: b0 = {0,1,3,4}, b1 = {1,2,4,5} → batch 1 keeps 2,5
    val got = entry("x170_stream_engine_dedup").build(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got shouldBe Array(
      (0L, "s0", 2L, 0L, 4L),
      (0L, "s1", 2L, 1L, 3L),
      (1L, "s0", 1L, 2L, 2L),
      (1L, "s1", 1L, 5L, 5L))
  }

  test("x171: hand-computed unigram Viterbi segmentation") {
    // corpus "ab ab b": words ab(wf 2), b(wf 1); pieces a=2, ab=2, b=3,
    // total 7. lp_milli: a/ab = round(1000·ln(2/7)) = −1253, b = −847.
    // "ab" best = [ab] (−1253, 1 piece) beating [a,b] (−2100, 2);
    // "b" best = [b] (−847, 1).
    val tmp = writeDocs(Seq((1L, "ab ab b", "en", "s0", 7L)))
    val got = entry("x171_unigram_segment").build(spark, tmp).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    got shouldBe Array(("ab", 2L, -1253L, 1), ("b", 1L, -847L, 1))
  }

  test("x163: every Z-cell is a small rectangle of the value plane") {
    // zcell drops the 3 low interleaved bits of each axis → an 8×8 bucket
    // block, so each cell's value span is ≤ 8/255 of the global range
    // (+1 bucket of slack for the hi endpoint landing in bucket 255)
    val rows = entry("x163_zorder_cells").build(spark, SparkTestSession.sf0001).collect()
    rows.length should be > 100
    val aLo = rows.map(_.getAs[Double]("a_min")).min
    val aHi = rows.map(_.getAs[Double]("a_max")).max
    val bLo = rows.map(_.getAs[Double]("b_min")).min
    val bHi = rows.map(_.getAs[Double]("b_max")).max
    val aTol = (aHi - aLo) * 9.0 / 255
    val bTol = (bHi - bLo) * 9.0 / 255
    rows.foreach { r =>
      (r.getAs[Double]("a_max") - r.getAs[Double]("a_min")) should be <= aTol
      (r.getAs[Double]("b_max") - r.getAs[Double]("b_min")) should be <= bTol
    }
    // and the cells partition the data: row counts sum to the table size
    val n = spark.read.parquet(s"${SparkTestSession.sf0001}/lineitem.parquet").count()
    rows.map(_.getAs[Long]("n")).sum shouldBe n
  }
}
