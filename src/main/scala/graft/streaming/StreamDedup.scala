package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact dedup at ingest: as document files land, fingerprint
  * the normalized text (native `graft_poly_hash`) and `dropDuplicates` on
  * it — Spark keeps the seen-fingerprint set as streaming state, so a
  * re-delivered or duplicated document never reaches the sink. This is
  * [[graft.operators.Dedup.exact]] as a continuous pipeline stage.
  *
  * State is one i64 per distinct document — bounded and tiny relative to
  * the corpus. For time-bounded retention (dedup only within a window),
  * add `withWatermark` on an event-time column before the dropDuplicates;
  * corpus dedup wants the unbounded form.
  */
object StreamDedup {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  def dedupByFingerprint(spark: SparkSession, dir: String, sinkName: String) = {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withColumn("fp", expr("graft_poly_hash(lower(trim(text)))"))
      .dropDuplicates("fp")
      .writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("append")
      .start()
  }
}
