package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamDedupSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  test("re-delivered document files are deduplicated by streaming state") {
    // stage the same corpus twice — a redelivery/duplicate-shard scenario
    val dir = java.nio.file.Files.createTempDirectory("stream-dedup").toString
    val src = java.nio.file.Paths.get(s"${SparkTestSession.sf0001}/documents.parquet")
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/part-0.parquet"))
    java.nio.file.Files.copy(src, java.nio.file.Paths.get(s"$dir/part-1.parquet"))

    val query = StreamDedup.dedupByFingerprint(spark, dir, "stream_dedup_test")
    try {
      query.processAllAvailable()
      val out = spark.table("stream_dedup_test")
      out.count() shouldBe 500L // 1000 streamed rows, 500 distinct texts
      out.select("fp").distinct().count() shouldBe 500L
    } finally query.stop()
  }
}
