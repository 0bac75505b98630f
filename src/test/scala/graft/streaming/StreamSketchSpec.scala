package graft.streaming

import graft.SparkTestSession
import graft.functions.CountMinSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The sketch-at-ingest story: because CountMinSketch's reduce == merge
  * (elementwise add), per-micro-batch buffers fold into a running sketch
  * whose final state is identical to a one-shot batch aggregation — the
  * constant-size streaming aggregate (d·w longs of state, forever) that
  * replaces an unbounded groupBy(key) at ingest time.
  */
class StreamSketchSpec extends AnyFunSuite with Matchers {

  test("per-micro-batch count-min buffers fold into the one-shot sketch") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("cms-in").toString
    def land(name: String, keys: Seq[Long]): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("cms-stage").toString
      keys.toDF("kh").coalesce(1).write.mode("overwrite").parquet(stage)
      val src = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath, java.nio.file.Paths.get(s"$in/$name.parquet"))
    }
    val d = 4; val w = 64
    val running = new Array[Long](d * w)
    val q = spark.readStream
      .schema(StructType(Seq(StructField("kh", LongType))))
      .option("maxFilesPerTrigger", "1").parquet(in)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val buf = batch.agg(CountMinSketch.sketch(col("kh"), d, w))
          .collect().head.getSeq[Long](0)
        var i = 0
        while (i < running.length) { running(i) += buf(i); i += 1 } // Aggregator.merge
      }
      .start()
    val b1 = (1L to 100L).map(_ % 9)
    val b2 = (1L to 50L).map(_ % 5)
    try {
      land("b1", b1); q.processAllAvailable()
      land("b2", b2); q.processAllAvailable()
    } finally q.stop()
    val oneShot = (b1 ++ b2).toDF("kh")
      .agg(CountMinSketch.sketch(col("kh"), d, w)).collect().head.getSeq[Long](0)
    running.toSeq shouldBe oneShot
  }
}
