package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-8 entries on toy data — the oracle gate
  * proves fixture equivalence; these pin the semantics on inputs small
  * enough to check by hand.
  */
class ExtensionRound8Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r8docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** 16 distinct tokens forming one chunk, tagged so chunks are unique per
    * doc unless deliberately shared.
    */
  private def chunk(tag: String): String =
    (1 to 16).map(i => s"$tag$i").mkString(" ")

  test("x102: shared chunks are excised, unique chunks survive in position order") {
    val shared = chunk("boiler")
    val tmp = writeDocs(Seq(
      // doc 1: unique A + shared + unique B → keeps A B in order
      (1L, s"${chunk("a")} $shared ${chunk("b")}", "en", "s", 0L),
      // doc 2: shared + unique C → keeps C
      (2L, s"$shared ${chunk("c")}", "en", "s", 0L),
      // doc 3: ONLY the shared chunk → drops out of the result entirely
      (3L, shared, "en", "s", 0L),
      // doc 4: under 16 tokens → never chunked, not in result
      (4L, "too short", "en", "s", 0L)))
    val out = entry("x102_boilerplate_excision").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept_chunks"), r.getAs[String]("text_clean"))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L) shouldBe ((2L, s"${chunk("a")} ${chunk("b")}"))
    out(2L) shouldBe ((1L, chunk("c")))
  }

  test("x102: a chunk repeated within ONE doc is not boilerplate (cross-doc only)") {
    val rep = chunk("x")
    val tmp = writeDocs(Seq(
      (1L, s"$rep $rep", "en", "s", 0L), // same chunk twice, same doc
      (2L, chunk("y"), "en", "s", 0L)))
    val out = entry("x102_boilerplate_excision").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_kept_chunks")).toMap
    // countDistinct(doc_id) == 1 for rep's fingerprint → kept, both copies
    out(1L) shouldBe 2L
    out(2L) shouldBe 1L
  }

  test("x103: every decision class lands on the constructed doc that triggers it") {
    val shared = chunk("s")
    val tmp = writeDocs(Seq(
      // 1: low-quality (5 repeated-ish tokens, score ~0.37 < 0.64)
      (1L, "x x x x x", "en", "s", 0L),
      // 2 and 3: identical good docs → 2 kept (min id), 3 exact_dup
      (2L, chunk("a"), "en", "s", 0L),
      (3L, chunk("a"), "en", "s", 0L),
      // 4: ONLY the shared chunk → chunk ratio 1.0 > 0.5 → boilerplate
      (4L, shared, "en", "s", 0L),
      // 5: shared chunk + unique chunk → ratio 0.5 ≤ 0.5 → survives
      (5L, s"$shared ${chunk("u")}", "en", "s", 0L),
      // 6 and 7: 15 of 16 tokens identical → Jaccard ≫ 0.5 → 7 near_dup
      (6L, chunk("n"), "en", "s", 0L),
      (7L, s"${(1 to 15).map(i => s"n$i").mkString(" ")} zz", "en", "s", 0L)))
    val out = entry("x103_curation_manifest").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("decision")).toMap
    out shouldBe Map(
      1L -> "quality",
      2L -> "kept",
      3L -> "exact_dup",
      4L -> "boilerplate",
      5L -> "kept",
      6L -> "kept",
      7L -> "near_dup")
  }

  test("x104: every diff class lands on the constructed id that triggers it") {
    // version carving: v1 = id%5!=0, v2 = id%7!=0, changed when id%11==0.
    //  5 → only v2 → added;  7 → only v1 → removed;
    // 11 → both, text differs → changed;  1 → both, same → unchanged;
    // 35 → neither version → absent from the diff entirely
    val tmp = writeDocs(Seq(
      (1L, "alpha beta", "en", "s", 0L),
      (5L, "gamma", "en", "s", 0L),
      (7L, "delta", "en", "s", 0L),
      (11L, "epsilon zeta", "en", "s", 0L),
      (35L, "eta", "en", "s", 0L)))
    val out = entry("x104_release_diff").build(spark, tmp)
      .collect().map(r => r.getAs[String]("status") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("first_doc"))).toMap
    out shouldBe Map(
      "added" -> ((1L, 5L)),
      "removed" -> ((1L, 7L)),
      "changed" -> ((1L, 11L)),
      "unchanged" -> ((1L, 1L)))
  }

  test("x102: the 15-token tail beyond the last full chunk is ignored by design") {
    val tail = (1 to 15).map(i => s"t$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, s"${chunk("a")} $tail", "en", "s", 0L),
      (2L, chunk("b"), "en", "s", 0L)))
    val out = entry("x102_boilerplate_excision").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_clean")).toMap
    out(1L) shouldBe chunk("a") // tail tokens absent from the rebuilt text
  }
}
