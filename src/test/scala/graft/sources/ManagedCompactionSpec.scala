package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.SparkTestSession

/** The manifest-generation MinHash layout (VERDICT r15 #5): compaction as
  * an immutable-generation publish instead of a directory-rename swap, so
  * a LIVE admit loop and a compact can run concurrently — the quiesced-
  * index constraint the rename swap carried (ddcc9ae) is closed for
  * managed indexes.
  */
class ManagedCompactionSpec extends AnyFunSuite with Matchers {
  private def spark = SparkTestSession.spark
  private def docs = spark.read
    .parquet(s"${SparkTestSession.sf0001}/documents.parquet")

  private def freshManagedIndex(): String = {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val idx = java.nio.file.Files.createTempDirectory("mgd-idx").toString
    Layouts.minhashIndex(docs.where(col("doc_id") % 4 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.manageMinhash(idx)
    idx
  }

  private def probe(idx: String, mod: Int) = graft.operators.Dedup
    .incrementalDedupStaged(docs.where(col("doc_id") % 4 === mod),
      idx, "doc_id", "text", 0.5)
    .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("manageMinhash migration is probe-invariant and idempotent") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val idx = java.nio.file.Files.createTempDirectory("mig-idx").toString
    Layouts.minhashIndex(docs.where(col("doc_id") % 4 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    val before = probe(idx, 1)
    Layouts.manageMinhash(idx)
    val (v, root) = Layouts.currentGeneration(
      idx, spark.sparkContext.hadoopConfiguration).get
    v shouldBe 0L
    root should endWith("g=000000000")
    probe(idx, 1) shouldBe before
    Layouts.manageMinhash(idx) // second call: no-op, still v0
    Layouts.currentGeneration(
      idx, spark.sparkContext.hadoopConfiguration).get._1 shouldBe 0L
  }

  test("managed compact folds committed slices, keeps the stream tail live, " +
      "and is probe-invariant") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val conf = spark.sparkContext.hadoopConfiguration
    val idx = freshManagedIndex()
    // a caller-named batch (folds) and two stream-lineage slices (tail
    // s1-b1 must stay live for its potential replay)
    Layouts.minhashAppend(docs.where(col("doc_id") % 4 === 1), idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("rel2"))
    Layouts.minhashAppend(docs.where(col("doc_id") % 8 === 2), idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("s1-b0"))
    Layouts.minhashAppend(docs.where(col("doc_id") % 8 === 6), idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("s1-b1"))
    val before = probe(idx, 3)
    val rowsBefore = Seq("fp", "banded", "shingles").map(t =>
      t -> spark.read.parquet(s"${Layouts.indexRoot(idx)}/$t")
        .drop("batch_id").distinct().count()).toMap
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    val (v, root) = Layouts.currentGeneration(idx, conf).get
    v shouldBe 1L
    // base + the live stream tail only; rel2 and s1-b0 folded into base
    val slices = spark.read.parquet(s"$root/banded")
      .select("batch_id").distinct().collect().map(_.getString(0)).toSet
    slices shouldBe Set("base", "s1-b1")
    probe(idx, 3) shouldBe before
    Seq("fp", "banded", "shingles").foreach { t =>
      spark.read.parquet(s"$root/$t").drop("batch_id").distinct()
        .count() shouldBe rowsBefore(t)
    }
    // previous generation retained as grace for in-flight readers
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000000")) shouldBe true
    // ... and retired by the NEXT compact
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 2L
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000000")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000001")) shouldBe true
  }

  test("replay of the last admitted batch AFTER a compact is still a no-op") {
    // the exact case the quiesced-index constraint existed for: batch
    // admitted, compact runs, then the at-least-once engine replays the
    // batch. The live-tail exemption keeps the batch's slice (and so its
    // self-exclusion) across the generation fold.
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val idx = freshManagedIndex()
    val ledger = java.nio.file.Files.createTempDirectory("mgd-led").toString + "/led"
    val g1 = docs.where(col("doc_id") % 4 === 1)
    graft.streaming.StreamDedup.admitBatch(g1, batchId = 0L, idx, ledger,
      threshold = 0.5, streamId = "lineA",
      groupBytes = 256L * 1024, pageRows = 2000)
    def ledgerRows() = spark.read.parquet(ledger)
      .select("doc_id", "status", "engine_batch_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    def probeNext() = probe(idx, 2)
    val (led1, p1) = (ledgerRows(), probeNext())
    led1.count(_._2 == "kept") should be > 0
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    probeNext() shouldBe p1 // the fold itself is probe-invariant
    // the at-least-once replay against the COMPACTED index
    graft.streaming.StreamDedup.admitBatch(g1, batchId = 0L, idx, ledger,
      threshold = 0.5, streamId = "lineA",
      groupBytes = 256L * 1024, pageRows = 2000)
    ledgerRows() shouldBe led1
    probeNext() shouldBe p1
  }

  test("managed IVF: generation publish, live tail, probe invariance, " +
      "replay-after-compact") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val emb = spark.read
      .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .where(col("vec_id") >= 10)
    val idx = java.nio.file.Files.createTempDirectory("mgd-ivf").toString
    Layouts.ivfIndex(emb.where(col("vec_id") % 2 === 0), idx,
      centModulo = 50, twoLevel = Some(false))
    Layouts.manageIvf(idx)
    val odd = emb.where(col("vec_id") % 2 === 1)
    Layouts.ivfAppend(odd, idx, batchId = Some("s1-b0"))
    val queries = spark.read
      .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .where(col("vec_id") < 10)
    def topk() = graft.operators.SimilaritySearch
      .ivfTopKStaged(queries, idx, k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def assignRows() = spark.read
      .parquet(s"${Layouts.indexRoot(idx)}/assign")
      .select("corpus_id").collect().map(_.getLong(0)).sorted.toSeq
    val (p1, rows1) = (topk(), assignRows())
    p1 should not be empty
    Layouts.ivfCompact(idx)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 1L
    // stream-shaped batch stays live through the fold; "base" absorbed
    // the build generation
    spark.read.parquet(s"${Layouts.indexRoot(idx)}/assign")
      .select("batch_id").distinct().collect()
      .map(_.getString(0)).toSet shouldBe Set("base", "s1-b0")
    topk() shouldBe p1
    assignRows() shouldBe rows1
    // at-least-once replay AFTER the compact: dynamic overwrite of the
    // live slice in the new generation, content unchanged
    Layouts.ivfAppend(odd, idx, batchId = Some("s1-b0"))
    topk() shouldBe p1
    assignRows() shouldBe rows1
  }

  test("legacy crashed swap self-heals on the next compact") {
    // simulate a process death between swapIn's two renames: the table
    // is stranded at .__old and the canonical path is missing. The next
    // compact must restore it BEFORE its own read (review r16: recovery
    // placed only inside swapIn sat behind the caller's read and was
    // unreachable).
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val idx = java.nio.file.Files.createTempDirectory("crash-idx").toString
    Layouts.minhashIndex(docs.where(col("doc_id") % 4 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    val before = probe(idx, 1)
    val fp = java.nio.file.Paths.get(s"$idx/fp")
    java.nio.file.Files.move(fp, java.nio.file.Paths.get(s"$idx/fp.__old"))
    java.nio.file.Files.exists(fp) shouldBe false
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    java.nio.file.Files.exists(fp) shouldBe true
    probe(idx, 1) shouldBe before
  }

  test("managed compact records its fold set for the writer fix-up") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val idx = freshManagedIndex()
    Layouts.minhashAppend(docs.where(col("doc_id") % 4 === 1), idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("rel2"))
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    val root = Layouts.indexRoot(idx)
    val folded = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/_FOLDED")), "UTF-8")
    folded should include("rel2") // a delayed writer check must skip it
    folded should include("base")
  }

  test("admit loop runs LIVE across a concurrent compact with ledger and " +
      "final probe unchanged vs an uncompacted control") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    def runLoop(compactDuring: Boolean): (Seq[(Long, String)], Map[Long, String]) = {
      val idx = freshManagedIndex()
      val base = java.nio.file.Files.createTempDirectory("mgd-loop").toString
      val in = s"$base/in"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
      val cols = graft.streaming.StreamDedup.docSchema.fieldNames.map(col)
      def land(mod8a: Int, name: String): Unit = {
        val stage = s"$base/stage-$name"
        docs.where(col("doc_id") % 8 === mod8a).select(cols: _*)
          .coalesce(1).write.mode("overwrite").parquet(stage)
        val src = new java.io.File(stage).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(src.toPath,
          java.nio.file.Paths.get(s"$in/$name.parquet"))
      }
      val q = graft.streaming.StreamDedup.ingestAdmitLoop(
        spark, in, idx, s"$base/led", s"$base/ckpt", streamId = Some("L"),
        groupBytes = 256L * 1024, pageRows = 2000)
      try {
        land(1, "g1")
        q.processAllAvailable()
        // compact concurrently with the NEXT batches landing and being
        // admitted — the race the manifest layout exists to survive
        val compact = if (compactDuring) Some(Future {
          Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
        }) else None
        // one landing per drain so the batch order (and hence the probe
        // lineage) is identical in both runs — the compact races the
        // admits in the background either way
        land(5, "g2")
        q.processAllAvailable()
        land(2, "g3")
        q.processAllAvailable()
        compact.foreach(Await.result(_, 120.seconds))
        land(6, "g4")
        q.processAllAvailable()
      } finally q.stop()
      val led = spark.read.parquet(s"$base/led")
        .select("doc_id", "status").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      (led, probe(idx, 3))
    }
    val (ledCtl, probeCtl) = runLoop(compactDuring = false)
    val (ledCmp, probeCmp) = runLoop(compactDuring = true)
    ledCmp shouldBe ledCtl
    probeCmp shouldBe probeCtl
    ledCtl.count(_._2 == "kept") should be > 0
  }

  test("managed posting: publish, sealed append, replay no-op, fold, grace retirement") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val conf = spark.sparkContext.hadoopConfiguration
    val idx = java.nio.file.Files.createTempDirectory("mgd-post").toString
    def hits(): Set[Long] = {
      val pat = "table part"
      val tris = (0 to pat.length - 3).map(i => pat.substring(i, i + 3)).distinct
      spark.read.parquet(Layouts.indexRoot(idx))
        .where(col("tri").isin(tris: _*))
        .groupBy("doc_id").agg(countDistinct("tri").as("nt"))
        .where(col("nt") === tris.size)
        .join(docs, "doc_id").where(col("text").contains(pat))
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    Layouts.postingIndex(docs.where(col("doc_id") % 2 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    val flat = hits()
    flat should not be empty
    // migration: probe-invariant, idempotent
    Layouts.managePosting(idx)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 0L
    hits() shouldBe flat
    Layouts.managePosting(idx)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 0L
    // append lands SEALED in the current generation and changes the hits
    val odd = docs.where(col("doc_id") % 2 === 1)
    Layouts.postingAppend(odd, idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("odd"))
    val grown = hits()
    grown should not equal flat
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    fs.exists(new org.apache.hadoop.fs.Path(
      s"${Layouts.indexRoot(idx)}/batch_id=odd/_SEALED")) shouldBe true
    // replayed append of the same batch id: a no-op at the row level too
    Layouts.postingAppend(odd, idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("odd"))
    val root0 = Layouts.indexRoot(idx)
    val rowsPerDoc = spark.read.parquet(root0)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hits() shouldBe grown
    // rebase: folds everything into one base slice of a NEW generation
    Layouts.sortedRebase(idx, Seq("tri"),
      groupBytes = 256L * 1024, pageRows = 2000)
    val (v1, root1) = Layouts.currentGeneration(idx, conf).get
    v1 shouldBe 1L
    spark.read.parquet(root1).select("batch_id").distinct()
      .collect().map(_.getString(0)).toSet shouldBe Set("base")
    hits() shouldBe grown
    spark.read.parquet(root1).groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe rowsPerDoc
    // grace: previous generation retained one cycle, retired by the next
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000000")) shouldBe true
    Layouts.sortedRebase(idx, Seq("tri"),
      groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 2L
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000000")) shouldBe false
    fs.exists(new org.apache.hadoop.fs.Path(s"$idx/g=000000001")) shouldBe true
    hits() shouldBe grown
  }

  test("slices appended on the FLAT layout survive migration + first " +
      "managed compact (migration seals them)") {
    // flat-layout appends never seal (_SEALED belongs to the managed
    // protocol), and the managed fold absorbs only sealed slices — so
    // the migration itself must seal what it moves, or pre-migration
    // batches vanish from the first compact's generation (ADVICE r16).
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val conf = spark.sparkContext.hadoopConfiguration

    // -- minhash trio
    val idx = java.nio.file.Files.createTempDirectory("mig-seal").toString
    Layouts.minhashIndex(docs.where(col("doc_id") % 4 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.minhashAppend(docs.where(col("doc_id") % 4 === 1), idx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("flatb"))
    val before = probe(idx, 2)
    val rowsBefore = spark.read.parquet(s"$idx/banded")
      .drop("batch_id").distinct().count()
    Layouts.manageMinhash(idx)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    fs.exists(new org.apache.hadoop.fs.Path(
      s"${Layouts.indexRoot(idx)}/banded/batch_id=flatb/_SEALED")) shouldBe true
    Layouts.minhashCompact(idx, groupBytes = 256L * 1024, pageRows = 2000)
    // flatb folded into base — its rows must still be there
    spark.read.parquet(s"${Layouts.indexRoot(idx)}/banded")
      .drop("batch_id").distinct().count() shouldBe rowsBefore
    probe(idx, 2) shouldBe before

    // -- posting table
    val pidx = java.nio.file.Files.createTempDirectory("mig-seal-p").toString
    Layouts.postingIndex(docs.where(col("doc_id") % 2 === 0), pidx,
      groupBytes = 256L * 1024, pageRows = 2000)
    Layouts.postingAppend(docs.where(col("doc_id") % 2 === 1), pidx,
      groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("flatp"))
    val pRows = spark.read.parquet(pidx).drop("batch_id").count()
    Layouts.managePosting(pidx)
    Layouts.sortedRebase(pidx, Seq("tri"),
      groupBytes = 256L * 1024, pageRows = 2000)
    spark.read.parquet(Layouts.indexRoot(pidx))
      .drop("batch_id").count() shouldBe pRows

    // -- IVF assign tree
    val emb = spark.read
      .parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
      .where(col("vec_id") >= 10)
    val vidx = java.nio.file.Files.createTempDirectory("mig-seal-v").toString
    Layouts.ivfIndex(emb.where(col("vec_id") % 2 === 0), vidx,
      centModulo = 50, twoLevel = Some(false))
    Layouts.ivfAppend(emb.where(col("vec_id") % 2 === 1), vidx,
      batchId = Some("flatv"))
    val vRows = spark.read.parquet(s"$vidx/assign")
      .select("corpus_id").collect().map(_.getLong(0)).sorted.toSeq
    Layouts.manageIvf(vidx)
    Layouts.ivfCompact(vidx)
    spark.read.parquet(s"${Layouts.indexRoot(vidx)}/assign")
      .select("corpus_id").collect()
      .map(_.getLong(0)).sorted.toSeq shouldBe vRows
  }

  test("managed BM25: appends land sealed across a CONCURRENT aggregating " +
      "compact and the serve equals an uncompacted control") {
    // the fifth managed family (round 18): three per-table manifests,
    // fold shapes that actually merge (df deltas summed, champions
    // re-selected) — a batch may fold in one table while staying live in
    // another, which is safe exactly because every generation of a table
    // is content-equivalent under the merge-on-read probe
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    def run(compactDuring: Boolean): Seq[Seq[Any]] = {
      val idx = java.nio.file.Files.createTempDirectory("mgd-bm25").toString
      Layouts.bm25Index(docs.where(col("doc_id") % 4 === 0), idx,
        groupBytes = 256L * 1024, pageRows = 2000)
      Layouts.manageBm25(idx)
      Layouts.bm25Append(docs.where(col("doc_id") % 4 === 1), idx,
        groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("r1-b0"))
      val compact = if (compactDuring) Some(Future {
        Layouts.bm25Compact(idx, groupBytes = 256L * 1024, pageRows = 2000)
      }) else None
      Layouts.bm25Append(docs.where(col("doc_id") % 4 === 2), idx,
        groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("r1-b1"))
      compact.foreach(Await.result(_, 120.seconds))
      Layouts.bm25Append(docs.where(col("doc_id") % 4 === 3), idx,
        groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("r1-b2"))
      graft.operators.Bm25
        .topK(spark, idx, Seq("scan", "merge", "vector"))
        .collect().map(_.toSeq).toSeq
    }
    val control = run(compactDuring = false)
    control should not be empty
    run(compactDuring = true) shouldBe control
  }

  test("managePosting finishes a crashed predecessor's publish") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val conf = spark.sparkContext.hadoopConfiguration
    val idx = java.nio.file.Files.createTempDirectory("mgd-crash").toString
    Layouts.postingIndex(docs.where(col("doc_id") % 4 === 0), idx,
      groupBytes = 256L * 1024, pageRows = 2000)
    val before = spark.read.parquet(idx).count()
    // simulate the crash window: slices already moved into g=000000000,
    // manifest never published
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    val gen = new org.apache.hadoop.fs.Path(s"$idx/g=000000000")
    fs.mkdirs(gen)
    fs.listStatus(new org.apache.hadoop.fs.Path(idx)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
      .foreach(st => assert(fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(gen, st.getPath.getName))))
    Layouts.currentGeneration(idx, conf) shouldBe None
    // the re-run must finish the publish, not demand a rebuild
    Layouts.managePosting(idx)
    Layouts.currentGeneration(idx, conf).get._1 shouldBe 0L
    spark.read.parquet(Layouts.indexRoot(idx)).count() shouldBe before
  }
}
