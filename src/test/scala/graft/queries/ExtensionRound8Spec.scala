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

  test("x105: majority vote over the 10 nearest neighbors, per fenced query") {
    // corpus: 6 label-1 vectors hugging the x-axis, 6 label-2 hugging y.
    // q0=(1,0) keeps all 6 label-1 plus the 4 least-bad label-2 → pred 1
    // with 6 votes; q1=(0,1) is the mirror image.
    val tmp = java.nio.file.Files.createTempDirectory("r8emb").toString
    val corpus = (0 to 5).map(i => (50L + i, Array(10f, i.toFloat), 1)) ++
      (0 to 5).map(i => (60L + i, Array(i.toFloat, 10f), 2))
    (Seq((0L, Array(1f, 0f), 1), (1L, Array(0f, 1f), 2)) ++ corpus)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = entry("x105_knn_label").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("true_label"), r.getAs[Long]("pred_label"),
          r.getAs[Long]("n_votes")))).toMap
    out shouldBe Map(0L -> ((1L, 1L, 6L)), 1L -> ((2L, 2L, 6L)))
  }

  test("x106: per-source percent-rank cutoff drops exactly the bottom fifth") {
    // 5 docs per source → percent_rank ∈ {0, .25, .5, .75, 1}; pr >= 0.2
    // keeps 4 of 5, and the dropped doc is the source's worst scorer.
    def doc(id: Long, src: String, nTok: Int) =
      (id, (1 to nTok).map(i => s"w$i").mkString(" "), "en", src, 0L)
    val tmp = writeDocs(
      (1 to 5).map(i => doc(i.toLong, "sa", 2 * i)) ++
        (1 to 5).map(i => doc(10L + i, "sb", 30 + i)))
    val out = entry("x106_adaptive_cutoff").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_total"), r.getAs[Long]("n_kept")))).toMap
    out shouldBe Map("sa" -> ((5L, 4L)), "sb" -> ((5L, 4L)))
    // the kept minimum sits strictly above each source's global minimum
    val scores = entry("x02_quality_score").build(spark, tmp)
      .selectExpr("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val kept = entry("x106_adaptive_cutoff").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("min_kept_score")).toMap
    kept("sa") should be > scores(1L) // doc 1 is sa's shortest → dropped
    kept("sb") should be > scores(11L)
  }

  test("x107: exact distinct per source, sketch within its acceptance bound") {
    val tmp = writeDocs(Seq(
      (1L, "a b c", "en", "sa", 0L),
      (2L, "a a a b", "en", "sb", 0L),
      (3L, "c b", "en", "sa", 0L))) // sa: {a,b,c}; sb: {a,b}
    val out = entry("x107_hll_audit").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_exact"), r.getAs[Boolean]("hll_ok")))).toMap
    out shouldBe Map("sa" -> ((3L, true)), "sb" -> ((2L, true)))
  }

  test("x109: the mislabeled audit vector loses its neighbor vote and is flagged") {
    // corpus: 6 label-1 vectors on the x-axis, 6 label-2 on the y-axis.
    // Audit vec 0 = (10,0) label 1 → neighbors agree → clean.
    // Audit vec 1 = (0,10) label 1 (WRONG; it sits in the y-cluster) →
    // 6 of its 10 nearest vote label 2 → flagged noisy.
    val tmp = java.nio.file.Files.createTempDirectory("r8emb2").toString
    val corpus = (0 to 5).map(i => (50L + i, Array(10f, i.toFloat), 1)) ++
      (0 to 5).map(i => (60L + i, Array(i.toFloat, 10f), 2))
    (Seq((0L, Array(10f, 0f), 1), (1L, Array(0f, 10f), 1)) ++ corpus)
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = entry("x109_label_noise").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("label") ->
        ((r.getAs[Long]("n_audited"), r.getAs[Long]("n_noisy")))).toMap
    out shouldBe Map(1L -> ((2L, 1L)))
  }

  test("x110: three BPE rounds — merged 'ab' token re-pairs with itself, not its half") {
    // "abab"×3 + "cd"×1. Round 1: (a,b) count 6. Round 2: the merged "ab"
    // pairs with the following "ab" (count 3) — NOT with a bare 'a', which
    // would be the fold-rule bug. Round 3: only (c,d) remains.
    val tmp = writeDocs(Seq(
      (1L, "abab abab cd", "en", "s", 0L),
      (2L, "abab", "en", "s", 0L)))
    val rows = entry("x110_bpe_merges").build(spark, tmp).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("pair_left"),
        r.getAs[String]("pair_right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count")))
    rows shouldBe Array(
      (1L, "a", "b", "ab", 6L),
      (2L, "ab", "ab", "abab", 3L),
      (3L, "c", "d", "cd", 1L))
  }

  test("x111: applying the 3 merges collapses 'abab' to one token (3.5 chars/token)") {
    // same corpus as the x110 spec: merges land ab → abab → cd, so the
    // corpus of 4 word instances (14 chars) tokenizes to 4 tokens drawn
    // from a 2-symbol vocabulary.
    val tmp = writeDocs(Seq(
      (1L, "abab abab cd", "en", "s", 0L),
      (2L, "abab", "en", "s", 0L)))
    val r = entry("x111_bpe_apply").build(spark, tmp).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_words") shouldBe 4L
    r.head.getAs[Long]("n_chars") shouldBe 14L
    r.head.getAs[Long]("n_tokens") shouldBe 4L
    r.head.getAs[Double]("chars_per_token") shouldBe 3.5
    r.head.getAs[Long]("vocab_size") shouldBe 2L
  }

  test("x112: sqrt temperature upsamples the tail source relative to the head") {
    // sa: 4 docs, sb: 1 doc → weights 2/3 and 1/3 of 5 targets →
    // sa gets floor(10/3)=3 (boost .75), sb gets floor(5/3)=1 (boost 1.0).
    val tmp = writeDocs(
      (1 to 4).map(i => (i.toLong, "a b", "en", "sa", 0L)) :+
        (9L, "a b", "en", "sb", 0L))
    val out = entry("x112_mixture_temperature").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("weight"),
          r.getAs[Long]("target_docs"), r.getAs[Double]("boost")))).toMap
    out("sa") shouldBe ((4L, 2.0 / 3.0, 3L, 0.75))
    out("sb") shouldBe ((1L, 1.0 / 3.0, 1L, 1.0))
  }

  test("x113: identical texts across sources land in the unordered source cell") {
    // docs 1 (sa), 2 (sb), 3 (sa) share one text → pairs (1,2) sa|sb,
    // (1,3) sa|sa, (2,3) sa|sb; doc 4 (sc) is unrelated → no row touches sc.
    val txt = (1 to 20).map(i => s"w$i").mkString(" ")
    val other = (1 to 20).map(i => s"z$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, txt, "en", "sa", 0L), (2L, txt, "en", "sb", 0L),
      (3L, txt, "en", "sa", 0L), (4L, other, "en", "sc", 0L)))
    val out = entry("x113_source_overlap").build(spark, tmp)
      .collect().map(r => (r.getAs[String]("source_x"), r.getAs[String]("source_y")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Double]("max_jac")))).toMap
    out shouldBe Map(("sa", "sa") -> ((1L, 1.0)), ("sa", "sb") -> ((2L, 1.0)))
  }

  test("x114: a 3-clique closes its wedge, a 3-chain does not") {
    // docs 1,2,3 share text T (clique: edges 12,13,23 → 1 wedge, closed);
    // docs 5,6,7 form a chain via overlapping halves... simpler: 5-6 share
    // text U and 6-7 share text V ≠ U → no 5-7 edge is impossible with
    // identical texts, so build the chain from a second clique-free pair
    // set: 5,6 share U; 7,8 share V. Expect edges 3+1+1=5, wedges 1
    // (1-2-3), triangles 1, closure 1.0.
    val T = (1 to 20).map(i => s"t$i").mkString(" ")
    val U = (1 to 20).map(i => s"u$i").mkString(" ")
    val V = (1 to 20).map(i => s"v$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, T, "en", "s", 0L), (2L, T, "en", "s", 0L), (3L, T, "en", "s", 0L),
      (5L, U, "en", "s", 0L), (6L, U, "en", "s", 0L),
      (7L, V, "en", "s", 0L), (8L, V, "en", "s", 0L)))
    val r = entry("x114_dup_triangles").build(spark, tmp).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_edges") shouldBe 5L
    r.head.getAs[Long]("n_wedges") shouldBe 1L
    r.head.getAs[Long]("n_triangles") shouldBe 1L
    r.head.getAs[Double]("closure_rate") shouldBe 1.0
  }

  test("x115: incoming docs classify exact_dup, then near_dup, then kept") {
    // existing (even ids): doc 2 = T, doc 4 = U. incoming (odd ids):
    // doc 1 = T (exact), doc 3 = U with one word swapped (near, jac ≈ .86),
    // doc 5 = fresh text (kept).
    val T = (1 to 20).map(i => s"t$i").mkString(" ")
    val U = (1 to 20).map(i => s"u$i").mkString(" ")
    val nearU = U.replace("u10", "zz")
    val fresh = (1 to 20).map(i => s"f$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (2L, T, "en", "s", 0L), (4L, U, "en", "s", 0L),
      (1L, T, "en", "s", 0L), (3L, nearU, "en", "s", 0L),
      (5L, fresh, "en", "s", 0L)))
    val r = entry("x115_incremental_dedup").build(spark, tmp).collect()
    r.length shouldBe 1
    r.head.getAs[Long]("n_incoming") shouldBe 3L
    r.head.getAs[Long]("n_exact_dropped") shouldBe 1L
    r.head.getAs[Long]("n_neardup_dropped") shouldBe 1L
    r.head.getAs[Long]("n_kept") shouldBe 1L
  }

  test("x116: even-count group lerps the p50 midpoint, sketch stays in bound") {
    // sa: token counts 2,4,6,8 → p50 = 5.0 (midpoint); sb: 3,5,7 → 5.0 exact.
    def doc(id: Long, src: String, nTok: Int) =
      (id, (1 to nTok).map(i => s"w$i").mkString(" "), "en", src, 0L)
    val tmp = writeDocs(Seq(
      doc(1, "sa", 2), doc(2, "sa", 4), doc(3, "sa", 6), doc(4, "sa", 8),
      doc(5, "sb", 3), doc(6, "sb", 5), doc(7, "sb", 7)))
    val out = entry("x116_quantile_audit").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("p50_exact"),
          r.getAs[Boolean]("sketch_ok")))).toMap
    out shouldBe Map("sa" -> ((4L, 5.0, true)), "sb" -> ((3L, 5.0, true)))
  }

  test("x117: the persisted-index probe reproduces x115's ledger exactly") {
    val T = (1 to 20).map(i => s"t$i").mkString(" ")
    val U = (1 to 20).map(i => s"u$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (2L, T, "en", "s", 0L), (4L, U, "en", "s", 0L),
      (1L, T, "en", "s", 0L), (3L, U.replace("u10", "zz"), "en", "s", 0L),
      (5L, (1 to 20).map(i => s"f$i").mkString(" "), "en", "s", 0L)))
    val direct = entry("x115_incremental_dedup").build(spark, tmp)
      .collect().map(_.toSeq).toSet
    val probed = entry("x117_ingest_probe").build(spark, tmp)
      .collect().map(_.toSeq).toSet
    probed shouldBe direct
    probed.head(3) shouldBe 1L // the near_dup is still caught via the index
  }

  test("x108: coverage at rank 50 over 60 uniform bigram types is 50/60") {
    // one 61-token doc → 60 distinct bigrams, each n=1; ranks 200/500
    // don't exist, so the curve has exactly the rank-50 point.
    val tmp = writeDocs(Seq(
      (1L, (1 to 61).map(i => s"t$i").mkString(" "), "en", "s", 0L)))
    val rows = entry("x108_bigram_coverage").build(spark, tmp).collect()
    rows.length shouldBe 1
    rows.head.getAs[Long]("rank") shouldBe 50L
    rows.head.getAs[Long]("cum_n") shouldBe 50L
    rows.head.getAs[Long]("n_total") shouldBe 60L
    rows.head.getAs[Double]("coverage") shouldBe (50.0 / 60.0)
  }

  test("x118: a doc straddling the 512-token cut is the shard's one boundary doc") {
    def doc(id: Long, nTok: Int) =
      (id, (1 to nTok).map(i => s"w$i").mkString(" "), "en", "s", 0L)
    // shard 0: docs 0 and 8 — 300 + 300 tokens; doc 8 spans the seq0/seq1
    // cut at 512. shard 1: doc 1 alone, 10 tokens.
    val tmp = writeDocs(Seq(doc(0, 300), doc(8, 300), doc(1, 10)))
    val out = entry("x118_sequence_packing").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("n_sequences"), r.getAs[Long]("n_boundary_docs"),
          r.getAs[Long]("last_seq_tokens")))).toMap
    out shouldBe Map(
      0L -> ((2L, 600L, 2L, 1L, 88L)),
      1L -> ((1L, 10L, 1L, 0L, 10L)))
  }

  test("x119: single-bucket corpus gives exact ppm shares; target-absent token scores 0") {
    // every 't' token lands in one bucket: tgt_cnt=3 (src0), all_cnt=4 →
    // contrib = 750000 ppm. 'zq' hashes to a different bucket (52 vs 55)
    // with tgt_cnt=0 → contrib 0, doc 2 not selected.
    val tmp = writeDocs(Seq(
      (0L, "t t t", "en", "src0", 0L),
      (1L, "t", "en", "src1", 0L),
      (2L, "zq zq", "en", "src1", 0L)))
    val out = entry("x119_importance_weighting").build(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_score"),
          r.getAs[Long]("n_selected")))).toMap
    out shouldBe Map(
      "src0" -> ((1L, 2250000L, 1L)),
      "src1" -> ((2L, 750000L, 1L)))
  }

  test("x120: each constructed doc fails exactly its targeted rule") {
    def toks(n: Int, len: Int) =
      (1 to n).map(i => ("abcdefgh" + i.toString).takeRight(len)).mkString(" ")
    val tmp = writeDocs(Seq(
      // A: 16 distinct 5-char tokens → passes all four rules
      (1L, toks(16, 5), "en", "s", 0L),
      // B: 10 distinct 5-char tokens → fails only the length rule
      (2L, toks(10, 5), "en", "s", 0L),
      // C: 16 distinct 3-char tokens → mean len 3.0, fails only meanlen
      (3L, toks(16, 3), "en", "s", 0L),
      // D: one 5-char token 16× → fails unique (1/16) and top (100%)
      (4L, Seq.fill(16)("abcde").mkString(" "), "en", "s", 0L)))
    val r = entry("x120_quality_rules").build(spark, tmp).collect()
    r.length shouldBe 1
    val m = r.head
    m.getAs[Long]("n_docs") shouldBe 4L
    m.getAs[Long]("n_fail_len") shouldBe 1L
    m.getAs[Long]("n_fail_meanlen") shouldBe 1L
    m.getAs[Long]("n_fail_unique") shouldBe 1L
    m.getAs[Long]("n_fail_top") shouldBe 1L
    m.getAs[Long]("n_kept") shouldBe 1L
  }

  test("x121: boundary token 'p' (polyhash 112 ≡ 0 mod 16) splits chunks; dup doc dedups") {
    // fps: 'a'=97, 'p'=112 (boundary), 'b'=98, 'z'=122. "a p b" chunks to
    // ["a p" (h=97*31+112=3119, len 2), "b" (h=98, len 1)]; doc 2 is an
    // exact dup so both its chunks dedup; doc 3 is the unique "z".
    val tmp = writeDocs(Seq(
      (1L, "a p b", "en", "s", 0L),
      (2L, "a p b", "en", "s", 0L),
      (3L, "z", "en", "s", 0L)))
    val r = entry("x121_cdc_chunk_dedup").build(spark, tmp).collect()
    r.length shouldBe 1
    val m = r.head
    m.getAs[Long]("total_chunks") shouldBe 5L
    m.getAs[Long]("distinct_chunks") shouldBe 3L
    m.getAs[Long]("total_tokens") shouldBe 7L
    m.getAs[Long]("stored_tokens") shouldBe 4L
    m.getAs[Long]("dedup_ppm") shouldBe (4L * 1000000L / 7L)
  }

  test("x122: centroid drops its near neighbors, far-but-assigned vectors survive") {
    // 3-D cells: A=(1,0,0) id 0, B=(0,1,0) id 50. ids 1, 2 hug A → dropped
    // by the smaller-id centroid; id 51 hugs B → dropped; id 52=(0,.1,1)
    // is assigned B (cos .0995 > 0 vs A) but below tau vs both 50 and 51.
    val tmp = java.nio.file.Files.createTempDirectory("r8semdedup").toString
    Seq(
      (0L, Array(1f, 0f, 0f), 0), (1L, Array(1f, 0f, 0.01f), 0),
      (2L, Array(0.9f, 0.1f, 0f), 0),
      (50L, Array(0f, 1f, 0f), 0), (51L, Array(0f, 1f, 0.01f), 0),
      (52L, Array(0f, 0.1f, 1f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = entry("x122_semdedup").build(spark, tmp)
      .collect().map(r => r.getAs[Long]("cent_id") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_kept")))).toMap
    out shouldBe Map(
      0L -> ((3L, 2L, 1L)),
      50L -> ((3L, 1L, 2L)))
  }

  test("x123: shared 8-token window covers both docs; overlap gap identity holds") {
    // doc 1 (10 toks) shares its start-0 window with doc 2 (exactly 8 toks);
    // doc 1's other two windows are unique. doc 4 is 9 repeated tokens, so
    // its two windows share one fp (within-doc repeat counts, as in Lee et
    // al.) and the gap identity gives 8 + min(8, 1-0) = 9 covered. doc 3 has
    // no repeated window and must be absent.
    val a8 = (1 to 8).map(i => s"a$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, s"$a8 u1 u2", "en", "s", 0L),
      (2L, a8, "en", "s", 0L),
      (3L, (1 to 9).map(i => s"z$i").mkString(" "), "en", "s", 0L),
      (4L, Seq.fill(9)("r").mkString(" "), "en", "s", 0L)))
    val r = entry("x123_dup_span_coverage").build(spark, tmp)
      .collect().map(m => (m.getAs[Long]("doc_id"), m.getAs[Long]("n_tokens"),
        m.getAs[Long]("n_dup_windows"), m.getAs[Long]("covered_tokens"),
        m.getAs[Long]("dup_ppm")))
    r shouldBe Array(
      (2L, 8L, 1L, 8L, 1000000L),
      (4L, 9L, 2L, 9L, 1000000L),
      (1L, 10L, 1L, 8L, 800000L))
  }

  test("x124: int8 ties + corpus_id tie-break cost query 0 one hit; query 1 clean") {
    // query 0 = (1,0): corpus 10..15 all quantize to (127,0) (second coords
    // 0.2..0.6 floor to 0), so the quantized top-5 is ids 10..14 by
    // tie-break while exact cosine ranks 15 (smallest second coord) first
    // and drops id 10 — recall 4/5. query 1 = (0,1): ids 16..20 keep their
    // exact order after quantization — recall 5/5.
    val tmp = java.nio.file.Files.createTempDirectory("r8int8").toString
    (Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(0f, 1f), 0),
      (10L, Array(100f, 0.6f), 0), (11L, Array(100f, 0.5f), 0),
      (12L, Array(100f, 0.4f), 0), (13L, Array(100f, 0.3f), 0),
      (14L, Array(100f, 0.25f), 0), (15L, Array(100f, 0.2f), 0),
      (16L, Array(0f, 10f), 0), (17L, Array(1f, 10f), 0),
      (18L, Array(2f, 10f), 0), (19L, Array(3f, 10f), 0),
      (20L, Array(4f, 10f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = entry("x124_int8_ann_recall").build(spark, tmp)
      .collect().map(m => (m.getAs[Long]("query_id"), m.getAs[Long]("n_hits"),
        m.getAs[Double]("recall")))
    r shouldBe Array((0L, 4L, 0.8), (1L, 5L, 1.0))
  }

  test("x125: identical docs share all fingerprints; an 11-token common run shares >= 1") {
    // docs 1/2 are identical 12-token texts -> identical winnowed sets, all
    // shared (ppm 1e6). doc 4 repeats doc 1's first 11 tokens (= w+k-1, the
    // winnowing guarantee threshold) then diverges -> must share at least
    // one fingerprint. doc 3 is all-unique -> filtered out.
    val w12 = (1 to 12).map(i => s"w$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, w12, "en", "s", 0L),
      (2L, w12, "en", "s", 0L),
      (3L, (1 to 12).map(i => s"z$i").mkString(" "), "en", "s", 0L),
      (4L, ((1 to 11).map(i => s"w$i") ++ (1 to 4).map(i => s"q$i")).mkString(" "),
        "en", "s", 0L)))
    val r = entry("x125_winnowing_fingerprints").build(spark, tmp)
      .collect().map(m => (m.getAs[Long]("doc_id"), m.getAs[Long]("n_fps"),
        m.getAs[Long]("n_shared"), m.getAs[Long]("shared_ppm")))
    r.map(_._1).toSeq should contain theSameElementsAs Seq(1L, 2L, 4L)
    val byDoc = r.map(t => t._1 -> t).toMap
    byDoc(1L)._2 shouldBe byDoc(2L)._2
    byDoc(1L)._4 shouldBe 1000000L
    byDoc(2L)._4 shouldBe 1000000L
    byDoc(4L)._3 should be >= 1L
  }

  test("x126: longest member wins its cluster; equal lengths fall back to smaller id") {
    // docs 1-3 share one text (jac = 1 -> one component, rep 1): doc 3 has
    // the largest n_chars and must be kept. docs 4/5 share another text
    // with EQUAL n_chars -> doc 4 kept by id tie-break. doc 6 is unrelated
    // and never enters the component table.
    val ta = "alpha beta gamma delta"
    val tb = "one two three four"
    val tmp = writeDocs(Seq(
      (1L, ta, "en", "s", 10L), (2L, ta, "en", "s", 20L), (3L, ta, "en", "s", 30L),
      (4L, tb, "en", "s", 15L), (5L, tb, "en", "s", 15L),
      (6L, "unrelated text entirely here", "en", "s", 99L)))
    val r = entry("x126_canonical_selection").build(spark, tmp)
      .collect().map(m => (m.getAs[Long]("rep_id"), m.getAs[Long]("n_members"),
        m.getAs[Long]("kept_doc"), m.getAs[Long]("kept_chars"),
        m.getAs[Long]("n_dropped")))
    r shouldBe Array(
      (1L, 3L, 3L, 30L, 2L),
      (4L, 2L, 4L, 15L, 1L))
  }

  test("x127: vectors quantized into the wrong cell drop out of the ADC top-5") {
    // codebook = {0: u, 50: w} (unit dims 1/2 of 64; id 0 is query AND
    // codeword by the % 50 rule, so it must be a codeword on purpose).
    // Corpus 10-13 reconstruct to u; 14, 18, 50 to w (18 = (.5,.55) is
    // L2-closer to w while still cosine-close to q0 = u; 13 = (.72,.7)
    // stays u). q0 exact top-5 {10,11,12,13,18} vs ADC {10,11,12,13,14}
    // (the u-group collapses to cos 1, rank 5 goes to the w-group's
    // smallest id) -> 4/5. q1 = w: exact {50,14,18,13,12} vs ADC
    // {14,18,50,10,11} -> 3/5.
    def vec(d1: Float, d2: Float): Array[Float] =
      Array(d1, d2) ++ Array.fill(62)(0f)
    val tmp = java.nio.file.Files.createTempDirectory("r8pq").toString
    (Seq(
      (0L, vec(1f, 0f), 0), (1L, vec(0f, 1f), 0),
      (10L, vec(1f, 0.1f), 0), (11L, vec(1f, 0.2f), 0), (12L, vec(1f, 0.3f), 0),
      (13L, vec(0.72f, 0.7f), 0),
      (14L, vec(0.6f, 0.8f), 0), (18L, vec(0.5f, 0.55f), 0),
      (50L, vec(0f, 1f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = entry("x127_pq_adc_recall").build(spark, tmp)
      .collect().map(m => (m.getAs[Long]("query_id"), m.getAs[Long]("n_hits"),
        m.getAs[Double]("recall")))
    r shouldBe Array((0L, 4L, 0.8), (1L, 3L, 0.6))
  }

  test("x128: train doc sharing an 8-gram with the eval shard is dropped; short docs can't hit") {
    // doc 0 is the eval shard (0 % 97 = 0). doc 1 embeds the eval 8-gram ->
    // contaminated; doc 2 is clean; doc 3 has < 8 tokens so it has no
    // windows and must count as kept, not crash or match.
    val e8 = (1 to 8).map(i => s"e$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (0L, e8, "en", "ev", 0L),
      (1L, s"$e8 tail1 tail2", "en", "sA", 0L),
      (2L, (1 to 10).map(i => s"c$i").mkString(" "), "en", "sA", 0L),
      (3L, "tiny doc here", "en", "sB", 0L)))
    val r = entry("x128_eval_decontam").build(spark, tmp)
      .collect().map(m => (m.getAs[String]("source"), m.getAs[Long]("n_train"),
        m.getAs[Long]("n_contaminated"), m.getAs[Long]("n_kept")))
    r shouldBe Array(("sA", 2L, 1L, 1L), ("sB", 1L, 0L, 1L))
  }

  test("x129: capped source keeps 2 epochs; surplus tops up uncapped sources pro rata") {
    // sources of 100/400/500 tokens, budget = 2*1000 div 3 = 666 each:
    // sA caps at 200 (2 epochs); sB/sC take 666 then split the 466 surplus
    // by size — sB tops out at its 800 cap, sC lands at 924 tokens
    // (1.848 epochs).
    def doc(n: Int) = Seq.fill(n)("t").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, doc(100), "en", "sA", 0L),
      (2L, doc(400), "en", "sB", 0L),
      (3L, doc(250), "en", "sC", 0L),
      (4L, doc(250), "en", "sC", 0L)))
    val r = entry("x129_epoch_allocation").build(spark, tmp)
      .collect().map(m => (m.getAs[String]("source"), m.getAs[Long]("n_tokens"),
        m.getAs[Long]("tokens_served"), m.getAs[Long]("epochs_ppm"),
        m.getAs[Long]("capped")))
    r shouldBe Array(
      ("sA", 100L, 200L, 2000000L, 1L),
      ("sB", 400L, 800L, 2000000L, 0L),
      ("sC", 500L, 924L, 1848000L, 0L))
  }

  test("x130: identical docs give a zero-error estimator on every pair") {
    // three copies of one text: every pair has exact jaccard 1 and all 16
    // signature components equal -> est = exact = 1e6 ppm, MAE/max/bias 0.
    // (The statistical error bar on mixed pairs is the oracle gate's job.)
    val txt = (1 to 12).map(i => s"m$i").mkString(" ")
    val tmp = writeDocs(Seq(
      (1L, txt, "en", "s", 0L), (2L, txt, "en", "s", 0L), (3L, txt, "en", "s", 0L)))
    val r = entry("x130_minhash_estimator_mae").build(spark, tmp).collect()
    r.length shouldBe 1
    val m = r.head
    m.getAs[Long]("n_pairs") shouldBe 3L
    m.getAs[Long]("mae_ppm") shouldBe 0L
    m.getAs[Long]("max_err_ppm") shouldBe 0L
    m.getAs[Long]("overest_pairs") shouldBe 0L
    m.getAs[Long]("underest_pairs") shouldBe 0L
  }

  test("x131: cell counts, lerp median, and imbalance over a hand-built assignment") {
    // centroids {0: u, 50: w}; corpus 10/11 hug u, 12/13/14 hug w, and 50
    // itself is corpus too (>= 10) -> cells u:2, w:4. Median of {2,4} lerps
    // to 3.0; imbalance = 4 * 1e6 * 2 div 6.
    def vec(d1: Float, d2: Float): Array[Float] =
      Array(d1, d2) ++ Array.fill(62)(0f)
    val tmp = java.nio.file.Files.createTempDirectory("r8ivfbal").toString
    (Seq(
      (0L, vec(1f, 0f), 0), (50L, vec(0f, 1f), 0),
      (10L, vec(1f, 0.1f), 0), (11L, vec(1f, 0.2f), 0),
      (12L, vec(0.1f, 1f), 0), (13L, vec(0.2f, 1f), 0), (14L, vec(0f, 0.9f), 0)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = entry("x131_ivf_cell_balance").build(spark, tmp).collect()
    r.length shouldBe 1
    val m = r.head
    m.getAs[Long]("n_cells") shouldBe 2L
    m.getAs[Long]("n_vecs") shouldBe 6L
    m.getAs[Long]("min_cell") shouldBe 2L
    m.getAs[Double]("p50_cell") shouldBe 3.0
    m.getAs[Long]("max_cell") shouldBe 4L
    m.getAs[Long]("imbalance_ppm") shouldBe (4L * 1000000L * 2L / 6L)
  }
}
