package graft.streaming

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class StreamDedupSpec extends AnyFunSuite with Matchers {

  test("checkpointed restart is exactly-once: no reprocessing, no loss") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("eo-in").toString
    val out = java.nio.file.Files.createTempDirectory("eo-out").toString + "/sink"
    val ckpt = java.nio.file.Files.createTempDirectory("eo-ckpt").toString
    def writeBatch(name: String, ids: Range): Unit =
      ids.map(i => (i.toLong, s"text $i", "en", "src0", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$in-stage/$name")
    def promote(name: String): Unit = {
      val src = new java.io.File(s"$in-stage/$name").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    def start() = spark.readStream.schema(StreamDedup.docSchema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .withColumn("fp", expr("hash(text)"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    writeBatch("b1", 0 until 100); promote("b1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the SAME checkpoint with a new batch landed
    writeBatch("b2", 100 until 180); promote("b2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0))
    rows.length shouldBe 180 // b1 not reprocessed after restart
    rows.toSet shouldBe (0L until 180L).toSet // nothing lost either
  }
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
