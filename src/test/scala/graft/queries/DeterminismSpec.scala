package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Results must be bit-identical whatever the shuffle width — the property
  * that makes the DuckDB oracle meaningful at any cluster size. A query
  * whose floats depend on partial-aggregation order would pass at one
  * parallelism and fail at another; every catalog query is built to be
  * order-independent (exact decimal/integral sums, left-to-right array
  * folds, deterministic tie-breaks).
  */
class DeterminismSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private val sensitive = Seq(
    "q07_groupby_agg", // decimal exact sums
    "q10_weighted_avg", // sum-of-products ratios
    "q13_selectivity_distribution", // multi-stage agg + join
    "x05_exact_dedup", // hash groupBy
    "x07_minhash_lsh_dedup", // band-join + jaccard
    "x10_ann_bruteforce", // float ranking
    "x17_corpus_clean", // full pipeline
    "x77_iqr_outliers", // interpolated quantiles + fence arithmetic
    "x80_linear_count_distinct", // bucket fill + ln estimate
    "x81_doc_surprisal", // micro-nat integer sums, integer div
    "x83_kmeans_refine", // argmin ties + truncating integer means
    "x84_countmin_heavy_hitters", // sketch buffer merge order
    "x86_weighted_sample", // pico-unit exponential-race keys
    "x88_dataset_card", // entropy micro-nat terms
    "x94_anomaly_days") // dyadic median/MAD fences

  test("catalog results are invariant to shuffle partition count") {
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "3")
    val byName = QueryCatalog.all.map(e => e.name -> e).toMap
    sensitive.foreach { name =>
      withClue(name) {
        val base = byName(name).build(spark, dir)
          .collect().map(_.toString).sorted.toSeq
        val alt = byName(name).build(wide, dir)
          .collect().map(_.toString).sorted.toSeq
        alt shouldBe base
      }
    }
  }
}
