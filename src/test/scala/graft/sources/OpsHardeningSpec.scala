package graft.sources

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Operational hardening for a corpus that accumulates over months: files
  * written by different pipeline versions (schema drift), partially-written
  * debris from crashed jobs, and incremental partition refreshes. These are
  * read/write-path behaviors a 100 TB deployment leans on daily; each spec
  * pins the exact knob and its failure mode at fixture scale.
  */
class OpsHardeningSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("schema evolution: mergeSchema unions columns across file generations") {
    val dir = java.nio.file.Files.createTempDirectory("ops-evolve").toString
    // generation 1: no lang column; generation 2 adds it
    Seq((1L, "alpha")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    Seq((2L, "beta", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/gen=2")

    // default read takes one file's schema — lang may silently vanish
    // depending on which footer wins; mergeSchema makes the union explicit
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.toSet shouldBe Set("doc_id", "text", "lang", "gen")
    val rows = merged.orderBy("doc_id").collect()
    rows(0).isNullAt(rows(0).fieldIndex("lang")) shouldBe true // old files read as NULL
    rows(1).getAs[String]("lang") shouldBe "en"
  }

  test("corrupt-file resilience: ignoreCorruptFiles skips debris instead of failing the scan") {
    val dir = java.nio.file.Files.createTempDirectory("ops-corrupt").toString
    Seq((1L, "good"), (2L, "rows")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(dir)
    // a crashed writer's partial file: valid magic prefix, truncated body
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      "PAR1garbage-not-a-footer".getBytes)

    // default: the scan must FAIL — silent data loss is worse than a crash
    val strict = intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    strict.getMessage.toLowerCase should (include("corrupt") or include("footer") or include("parquet"))

    // opt-in recovery path for debris cleanup jobs
    val conf = "spark.sql.files.ignoreCorruptFiles"
    val saved = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "true")
      spark.read.parquet(dir).count() shouldBe 2L
    } finally saved.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
  }

  test("dynamic partition overwrite replaces only refreshed partitions") {
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val saved = spark.conf.getOption(conf)
    val dir = java.nio.file.Files.createTempDirectory("ops-dpo").toString
    try {
      spark.conf.set(conf, "dynamic")
      Seq((1L, "a", "s1"), (2L, "b", "s2"))
        .toDF("doc_id", "text", "source")
        .write.partitionBy("source").mode("overwrite").parquet(dir)
      // incremental refresh touches ONLY source=s2; s1 must survive
      Seq((3L, "b2", "s2")).toDF("doc_id", "text", "source")
        .write.partitionBy("source").mode("overwrite").parquet(dir)
      val out = spark.read.parquet(dir)
        .orderBy("doc_id").collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
      out shouldBe Array((1L, "s1"), (3L, "s2"))

      // contrast: static mode would have dropped s1 wholesale
      spark.conf.set(conf, "static")
      Seq((4L, "c", "s3")).toDF("doc_id", "text", "source")
        .write.partitionBy("source").mode("overwrite").parquet(dir)
      spark.read.parquet(dir).select("source").distinct().collect()
        .map(_.getString(0)).toSet shouldBe Set("s3")
    } finally saved.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
  }
}
