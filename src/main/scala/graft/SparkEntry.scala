package graft

import graft.queries.QueryCatalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is derived from [[graft.queries.QueryCatalog]]: one entry per
  * implemented operator from SURVEY.md §2 (+ extensions), each paired with the
  * DuckDB oracle SQL the driver hash-compares against at sf0.01.
  */
object SparkEntry {

  private def catalog = QueryCatalog.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(e => e.name -> e.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(e => e.oracle.map(sql => e.name -> sql)).toMap
}
