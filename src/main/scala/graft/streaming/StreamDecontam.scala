package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Admit-time eval-set decontamination — the gate a training-data
  * ingest runs BEFORE a document enters the corpus: each micro-batch of
  * incoming docs is checked for verbatim quotes of the frozen eval
  * phrases ([[graft.operators.Phrase.contaminated]] — the x193 slot
  * algebra over the batch's own tokenization, no index required because
  * a micro-batch is bounded) and every hit lands in an idempotent
  * quarantine ledger. The post-hoc corpus audit (x193) answers "is the
  * shipped corpus clean?"; this answers "never let it get dirty" —
  * contamination caught at admit time costs one batch-sized probe,
  * caught at release time it costs a corpus-wide retraction. Per
  * trigger: O(batch tokens) tokenize + a broadcast phrase join; the
  * eval-phrase list is the bounded side by construction (an eval set is
  * curated, never corpus-sized). Ledger replays are dynamic-overwrite
  * no-ops per batch partition, the x158 idempotence contract.
  */
object StreamDecontam {

  /** Ingest feed file shape: one row per incoming document. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** One micro-batch of incoming docs → quarantine ledger rows
    * (doc_id, phrase, n_occ, batch_id); clean docs produce no row.
    */
  def gateBatch(
      batch: DataFrame,
      batchId: Long,
      phrases: Seq[Seq[String]],
      ledgerPath: String): Unit =
    graft.operators.Phrase.contaminated(batch, phrases)
      .withColumn("batch_id", lit(batchId))
      .write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .mode("overwrite")
      .parquet(ledgerPath)

  /** File-source stream of incoming docs → per-trigger quarantine
    * ledger against the fixed eval-phrase list.
    */
  def gate(
      spark: SparkSession,
      dir: String,
      phrases: Seq[Seq[String]],
      ledgerPath: String,
      checkpoint: String) =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        gateBatch(batch, batchId, phrases, ledgerPath)
      }
      .start()
}
