package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Known-answer tests for the round-17 hardening — the x171 segmentable-
  * length cap (VERDICT r16 #5): words past the cap bypass the per-char DP
  * unroll and are greedy-chunked, so one pathological unbroken token
  * can no longer drive an O(token-length) plan chain at 100 TB.
  */
class ExtensionRound17Spec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def entry(name: String) = QueryCatalog.all.find(_.name == name).get

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("r17docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Reference unigram-LM pieces: pf over every 1..4-char span occurrence
    * weighted by word frequency, milli log-probs per the x141 convention.
    */
  private def refLp(words: Map[String, Long]): Map[String, Long] = {
    val pf = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wf) <- words; i <- 0 until w.length;
         j <- (i + 1) to math.min(w.length, i + 4))
      pf(w.substring(i, j)) = pf.getOrElse(w.substring(i, j), 0L) + wf
    val total = pf.values.sum.toDouble
    pf.map { case (p, f) =>
      p -> math.round(1000.0 * (math.log(f.toDouble) - math.log(total)))
    }.toMap
  }

  /** All (score, nPieces) segmentations of `w` into 1..4-char pieces. */
  private def bestSeg(w: String, lp: Map[String, Long]): (Long, Int) = {
    def go(pos: Int): Seq[(Long, Int)] =
      if (pos == w.length) Seq((0L, 0))
      else for {
        j <- (pos + 1) to math.min(w.length, pos + 4)
        (s, n) <- go(j)
      } yield (s + lp(w.substring(pos, j)), n + 1)
    go(0).maxBy { case (s, n) => (s, -n) }
  }

  test("x171: words past the 64-char cap are greedy-chunked, short words " +
      "still take the exact DP optimum") {
    val long = "x" * 70 // would be a 70-step DP unroll without the cap
    val tmp = writeDocs(Seq(
      (1L, s"ab ab cd $long", "en", "s0", 100L)))
    val lp = refLp(Map("ab" -> 2L, "cd" -> 1L, long -> 1L))
    val got = entry("x171_unigram_segment").build(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    got.keySet shouldBe Set("ab", "cd", long)
    got("ab") shouldBe bestSeg("ab", lp)
    got("cd") shouldBe bestSeg("cd", lp)
    // pass-through: ceil(70/4) = 18 greedy chunks (17 x "xxxx" + "xx"),
    // scored with the same piece table the DP words use
    val chunkScore = 17L * lp("xxxx") + lp("xx")
    got(long) shouldBe (chunkScore, 18)
  }

  test("x171: an all-short corpus is unaffected by the cap machinery") {
    val tmp = writeDocs(Seq((1L, "ab ab cd", "en", "s0", 8L)))
    val lp = refLp(Map("ab" -> 2L, "cd" -> 1L))
    val got = entry("x171_unigram_segment").build(spark, tmp).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getInt(3))).toMap
    got("ab") shouldBe bestSeg("ab", lp)
    got("cd") shouldBe bestSeg("cd", lp)
  }

  // doc 2/6 → base (even; both also carry the probe residue %4 == 2, so
  // each probes the index too — self-matches excluded by id), doc 5 →
  // batch g1 (folded by the rebase), doc 7 → batch g3 (live slice).
  // Docs 2/5/6 share text (simhash identical, hamming 0); doc 7 differs.
  private def simhashDocs() = writeDocs(Seq(
    (2L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (5L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (6L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
    (7L, "completely unrelated content with different words entirely", "en", "s0", 57L)))

  test("x173: probe hits base AND folded AND-not-unrelated across the " +
      "managed lifecycle") {
    val got = entry("x173_simhash_index_probe").build(spark, simhashDocs())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((2L, 5L, 0L), (2L, 6L, 0L), (6L, 2L, 0L), (6L, 5L, 0L))
  }

  test("x174: retractFolded erases the folded batch's rows — probes no " +
      "longer match doc 5, still match base") {
    val got = entry("x174_retract_after_fold").build(spark, simhashDocs())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((2L, 6L, 0L), (6L, 2L, 0L))
  }

  test("x176: minhash retract-after-fold — poison erased, shared " +
      "fingerprint survives via per-(fp, src_batch) dedup") {
    // g0 = doc 0 (text A), g1 = doc 1 (text B, kept), probe g2 = docs
    // 2 (text A — a true exact dup of base) and 5 (text C — unique).
    // The staging appends the PROBE docs as the folded poison, then
    // retracts it: doc 5 kept proves no poison leak (under-delete),
    // doc 2 exact_dup proves base's fp_A survived the retraction of the
    // poison's identical fp (over-delete — the per-(fp, src_batch) fold
    // dedup is the mechanism under test).
    val tmp = writeDocs(Seq(
      (0L, "alpha beta gamma delta epsilon", "en", "s0", 30L),
      (1L, "zeta eta theta iota kappa", "en", "s0", 25L),
      (2L, "alpha beta gamma delta epsilon", "en", "s0", 30L),
      (5L, "completely different unique content here", "en", "s0", 40L)))
    val got = entry("x176_minhash_retract_folded").build(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    got shouldBe Seq(("s0", 2L, 1L, 0L, 1L))
  }

  test("minhashRetractFolded guardrail: a provenance-less managed index refuses") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.sources.Layouts
    val docs = spark.read.parquet(s"${simhashDocs()}/documents.parquet")
    val idx = java.nio.file.Files.createTempDirectory("mh-noprov").toString
    Layouts.minhashIndex(docs, idx, groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.manageMinhash(idx)
    intercept[IllegalArgumentException] {
      Layouts.minhashRetractFolded(idx, "g1")
    }
  }

  test("ivfRetractFolded guardrail: a provenance-less managed index refuses; " +
      "a provenance-mismatched append refuses") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.sources.Layouts
    val emb = spark.read
      .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .where(org.apache.spark.sql.functions.col("vec_id") >= 10)
    val idx = java.nio.file.Files.createTempDirectory("ivf-noprov").toString
    Layouts.ivfIndex(emb, idx, centModulo = 50, twoLevel = Some(false))
    Layouts.manageIvf(idx)
    intercept[IllegalArgumentException] {
      Layouts.ivfRetractFolded(idx, "g1")
    }
    // a provenanced append into a bare table forks the schema — refused
    intercept[IllegalArgumentException] {
      Layouts.ivfAppend(emb, idx, batchId = Some("g1"), provenance = true)
    }
  }

  test("retractFolded guardrails: no provenance → refuse; flat layout → refuse") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import graft.sources.Layouts
    val docs = spark.read.parquet(s"${simhashDocs()}/documents.parquet")
    val rows = docs.selectExpr("doc_id", "doc_id % 7 AS k")
    // managed but provenance-less: the fold left no src_batch to filter
    val bare = java.nio.file.Files.createTempDirectory("rf-bare").toString
    Layouts.sortedStats(rows, bare, Seq("k"), batchId = Some("base"))
    Layouts.manageSortedTable(bare)
    intercept[IllegalArgumentException] {
      Layouts.retractFolded(bare, "g1", Seq("k"))
    }
    // flat (unmanaged): a folded batch is unrecoverable by id
    val flat = java.nio.file.Files.createTempDirectory("rf-flat").toString
    Layouts.sortedStats(rows, flat, Seq("k"), batchId = Some("base"))
    intercept[RuntimeException] {
      Layouts.retractFolded(flat, "g1", Seq("k"))
    }
  }
}
