package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 serving over the persisted term-posting index
  * (`graft.sources.Layouts.bm25Index`): the probe reads only the query
  * terms' posting ranges (the literal `In(term, ...)` predicate is what
  * gives the term-sorted postings their row-group pruning), broadcasts
  * the term-df sidecar, crosses the 1-row global stats, and scores with
  * the x52 rational-Robertson tree — per-(term, doc) scores, no
  * cross-term float sum, ties broken by doc_id. Serving cost is
  * O(matching postings), never a corpus scan; doc length comes
  * denormalized out of the posting row so no per-doc table is joined.
  */
object Bm25 {

  def topK(
      spark: SparkSession,
      indexPath: String,
      terms: Seq[String],
      k: Int = 10): DataFrame = {
    // heal a crashed sidecar swap before reading — the managed
    // families' recovery-on-read contract
    graft.sources.Layouts.bm25Recover(indexPath)(spark)
    val post = spark.read.parquet(s"$indexPath/postings")
      .where(col("term").isin(terms: _*))
    val dfreq = spark.read.parquet(s"$indexPath/sidecar/terms")
      .where(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$indexPath/sidecar/stats")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(desc("score"), asc("doc_id"))
    post.join(broadcast(dfreq), "term").crossJoin(stats)
      .withColumn("avgdl", col("total").cast("double") / col("n"))
      .withColumn("idf", ((col("n") - col("df")) + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("score", col("idf") * ((col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") / col("avgdl"))))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("term", "rank", "doc_id", "tf", "dl", "score")
      .orderBy("term", "rank")
  }
}
