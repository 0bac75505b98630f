package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Contract of the persisted IVF index
  * ([[graft.sources.Layouts.ivfIndex]] +
  * [[SimilaritySearch.ivfTopKStaged]]): the staged probe returns exactly
  * what the in-session [[SimilaritySearch.ivfTopK]] computes from the same
  * centroid set, and the probe's scan of the cell-partitioned lists is
  * dynamic-partition-pruned — only the probed cell directories are read.
  */
class IvfIndexSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private lazy val e =
    spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")

  private lazy val indexDir: String = {
    val out = java.nio.file.Files.createTempDirectory("ivfspec").toString
    graft.sources.Layouts.ivfIndex(
      e.where(col("vec_id") >= 10), out, centModulo = 50)
    out
  }

  test("staged probe is row-identical to the in-session IVF search") {
    val queries = e.where(col("vec_id") < 10)
    val staged = SimilaritySearch
      .ivfTopKStaged(queries, indexDir, k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    val inSession = SimilaritySearch
      .ivfTopK(queries, e.where(col("vec_id") >= 10),
        e.where(col("vec_id") % 50 === 0 && col("vec_id") >= 10),
        k = 5, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    staged.length should be > 0
    staged.map(_.toSeq.toList).toList shouldBe inSession.map(_.toSeq.toList).toList
  }

  test("probe scan of the inverted lists is dynamic-partition-pruned") {
    val df = SimilaritySearch.ivfTopKStaged(
      e.where(col("vec_id") < 10), indexDir, k = 5, nprobe = 2)
    df.collect()
    // the assign/ scan must carry a runtime partition filter on cent_id —
    // that is the "read only the probed cells" property the persisted
    // layout exists for
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in the probe plan:\n$plan")
  }

  test("index meta records the centroid sampling") {
    val meta = spark.read.parquet(s"$indexDir/meta").collect()
    meta.map(_.getLong(0)).toList shouldBe List(50L)
  }
}
