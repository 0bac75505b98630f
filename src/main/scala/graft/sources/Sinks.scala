package graft.sources

import org.apache.spark.sql.DataFrame

/** Output sinks matching the reference's SQL corpus (S9: `COPY (…) TO
  * 'file.csv' (FORMAT CSV, HEADER)`,
  * /root/reference/datasets/snowset/query_selectivity_distribution.sql:1,61).
  */
object Sinks {

  /** Single CSV file with header — the reference's analysis output shape.
    * `coalesce(1)` is correct here because these are small aggregated
    * results; large extracts should drop the coalesce and write one part
    * per partition.
    */
  def writeCsvSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Partitioned CSV for large results (one file per partition). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
