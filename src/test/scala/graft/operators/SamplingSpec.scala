package graft.operators

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SamplingSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private lazy val docs =
    spark.read.parquet(s"${SparkTestSession.sf0001}/documents.parquet")

  test("sample membership is a pure function of id: stable under repartitioning") {
    val a = Sampling.deterministicSample(docs, "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 30)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    // rate lands near 30% (hash-uniformity smoke, generous tolerance)
    val rate = a.size.toDouble / docs.count()
    rate shouldBe 0.30 +- 0.10
  }

  test("growing the input never flips existing rows (incremental-ingest property)") {
    val half = docs.where(org.apache.spark.sql.functions.col("doc_id") < 250)
    val fromHalf = Sampling.deterministicSample(half, "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fromFull = Sampling.deterministicSample(docs, "doc_id", 40)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    fromHalf shouldBe fromFull.filter(_ < 250)
  }

  test("split is disjoint and exhaustive with cumulative bounds") {
    val s = Sampling.split(docs, "doc_id", trainPct = 80, valPct = 10)
    s.count() shouldBe docs.count()
    val byLabel = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    byLabel.values.sum shouldBe docs.count()
    byLabel("train").toDouble / docs.count() shouldBe 0.8 +- 0.1
  }

  test("sampling and split bucketings are independent (salted hashes)") {
    // Regression: both operators hashed the bare id, so a stratum sampled
    // at rate r <= trainPct survived ONLY in buckets < r — split() then
    // labeled every surviving row 'train' and val/test got zero rows.
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "source",
      (0 until 20).map(i => s"src$i" -> 50).toMap)
    val s = Sampling.split(sampled, "doc_id", trainPct = 80, valPct = 10)
    val byLabel = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLabel.keySet shouldBe Set("train", "val", "test")
    // ~10% of the sampled rows in val and test each, not zero
    val n = sampled.count().toDouble
    byLabel("val") / n shouldBe 0.10 +- 0.07
    byLabel("test") / n shouldBe 0.10 +- 0.07
  }

  test("stratified rates apply per stratum; unlisted strata drop") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src1" -> 100, "src2" -> 0))
    val srcs = out.select("source").distinct().collect().map(_.getString(0)).toSet
    srcs shouldBe Set("src1") // src2 rate 0, everything else unlisted
    out.count() shouldBe docs.where(
      org.apache.spark.sql.functions.col("source") === "src1").count()
  }
}
