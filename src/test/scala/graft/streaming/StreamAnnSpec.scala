package graft.streaming

import graft.SparkTestSession
import graft.operators.SimilaritySearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamAnnSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private lazy val e =
    spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")

  private lazy val indexDir: String = {
    val out = java.nio.file.Files.createTempDirectory("annidx").toString
    graft.sources.Layouts.ivfIndex(
      e.where(col("vec_id") >= 10), out, centModulo = 50)
    out
  }

  private def landQueries(dir: String, name: String, ids: Seq[Long]): Unit = {
    val stage = java.nio.file.Files.createTempDirectory("ann-stage").toString
    e.where(col("vec_id").isin(ids: _*)).coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val src = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
  }

  test("streamed probes equal the batch probe per query — batching-invariant ledger") {
    val in = java.nio.file.Files.createTempDirectory("ann-in").toString
    val ledger = java.nio.file.Files.createTempDirectory("ann-led").toString + "/ledger"
    val ckpt = java.nio.file.Files.createTempDirectory("ann-ckpt").toString
    val q = StreamAnn.serve(spark, in, indexDir, ledger, ckpt, k = 5, nprobe = 2)
    try {
      landQueries(in, "b1", Seq(0L, 1L, 2L))
      q.processAllAvailable()
      landQueries(in, "b2", Seq(3L, 4L))
      q.processAllAvailable()
      val streamed = spark.read.parquet(ledger)
        .select("query_id", "corpus_id", "cos", "rank")
        .collect().map(_.toSeq.toList).toSet
      val batch = SimilaritySearch
        .ivfTopKStaged(e.where(col("vec_id") < 5), indexDir, k = 5, nprobe = 2)
        .collect().map(_.toSeq.toList).toSet
      streamed should not be empty
      streamed shouldBe batch
    } finally q.stop()
  }

  test("a query re-delivered WITHIN one batch does not corrupt its top-k") {
    // duplicated rows sharing a query_id would share the per-query
    // row_number windows (each top cell/neighbor kept once per copy);
    // probeBatch dedups on vec_id so the ledger equals the clean probe
    val ledger = java.nio.file.Files.createTempDirectory("ann-led3").toString + "/ledger"
    val dup = e.where(col("vec_id") < 3).union(e.where(col("vec_id") === 1))
    StreamAnn.probeBatch(dup, 0L, indexDir, ledger, k = 5, nprobe = 2)
    val got = spark.read.parquet(ledger)
      .select("query_id", "corpus_id", "cos", "rank")
      .collect().map(_.toSeq.toList).toSet
    val clean = SimilaritySearch
      .ivfTopKStaged(e.where(col("vec_id") < 3), indexDir, k = 5, nprobe = 2)
      .collect().map(_.toSeq.toList).toSet
    got shouldBe clean
  }

  test("a replayed batch_id overwrites its ledger slice") {
    val ledger = java.nio.file.Files.createTempDirectory("ann-led2").toString + "/ledger"
    val qs = e.where(col("vec_id") < 3)
    StreamAnn.probeBatch(qs, 4L, indexDir, ledger, k = 5, nprobe = 2)
    val once = spark.read.parquet(ledger).count()
    StreamAnn.probeBatch(qs, 4L, indexDir, ledger, k = 5, nprobe = 2) // replay
    spark.read.parquet(ledger).count() shouldBe once
  }
}
