package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ANN serving against a persisted IVF index
  * ([[graft.sources.Layouts.ivfIndex]], flat or two-level build): as
  * query-vector files land, each micro-batch is probed with
  * [[graft.operators.SimilaritySearch.ivfTopKStaged]] and the per-query
  * top-k ledger appends to the sink — the continuous form of x144/x145.
  *
  * Scale/state shape: the corpus is touched ONLY through the index's
  * dynamic-partition-pruned cell join (nprobe directories per distinct
  * probed cell), the centroid table broadcasts, and nothing accumulates
  * in the stream — O(batch) memory forever. Because every query row is
  * scored independently against the index, the ledger is
  * batching-invariant (stream ≡ batch exactly, StreamAnnSpec pins it) —
  * the property the PSI monitor deliberately does NOT have — and
  * replayed batches overwrite their own batch_id partition (at-least-once
  * foreachBatch → idempotent dynamic-partition overwrite).
  */
object StreamAnn {

  /** embeddings.parquet physical schema (the query feed's file shape). */
  val querySchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** One micro-batch of probes → ledger rows
    * (query_id, corpus_id, cos, rank, batch_id), idempotent under replay.
    * vec_id is the idempotency key WITHIN a batch too: an at-least-once
    * feed can re-deliver a query inside one file, and duplicated rows
    * sharing a query_id would pollute the per-query row_number windows
    * (each top cell/neighbor kept once per copy) — so the batch is
    * deduped before probing, which is also what makes the
    * batching-invariance claim hold for replayed rows.
    */
  def probeBatch(
      batch: DataFrame,
      batchId: Long,
      indexPath: String,
      ledgerPath: String,
      k: Int,
      nprobe: Int): Unit =
    graft.operators.SimilaritySearch
      .ivfTopKStaged(batch.dropDuplicates("vec_id"), indexPath, k = k, nprobe = nprobe)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(ledgerPath)

  /** File-source stream of query vectors → per-trigger top-k ledger. */
  def serve(
      spark: SparkSession,
      dir: String,
      indexPath: String,
      ledgerPath: String,
      checkpoint: String,
      k: Int = 5,
      nprobe: Int = 2) =
    spark.readStream
      .schema(querySchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        probeBatch(batch, batchId, indexPath, ledgerPath, k, nprobe)
      }
      .start()
}
