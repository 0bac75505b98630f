package graft.operators

import graft.functions.{Aggregations, Predicates}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The reference engine's query surface as a fluent builder over a parquet
  * table: SELECT <columns> WHERE <predicate mini-language> with an optional
  * single-pass multi-aggregate list (the full v1 pipeline,
  * /root/reference/v1/src/main.rs:202-322: parse → early projection →
  * row-group pruning → vectorized filter → aggregate → late projection).
  *
  * Everything the reference hand-implements is declared here and delegated to
  * Catalyst: early/late projection = ColumnPruning, row-group pruning =
  * parquet filter pushdown, the 15 typed comparison kernels = codegen'd
  * BinaryComparison, partial aggregation = two-phase HashAggregateExec. The
  * resulting physical plan is
  * `HashAggregate(final) ← Exchange ← HashAggregate(partial) ← Filter ←
  * FileScan parquet [PushedFilters: ...]` — one shuffle of one row per
  * partition, which is the shape that survives a 1000-executor scale-up.
  */
final case class ParquetQuery(
    spark: SparkSession,
    path: String,
    selectCols: Option[Seq[String]] = None,
    predicate: Option[String] = None,
    predicateByIndex: Boolean = false,
    aggregations: Seq[String] = Nil,
    referenceExact: Boolean = false) {

  /** SELECT an explicit column list (P1/P2). */
  def select(cols: String*): ParquetQuery = copy(selectCols = Some(cols))

  /** SELECT the first n schema columns — the reference's `-cc` flag (P3,
    * v1/src/main.rs:103-110,209-212).
    */
  def selectFirst(n: Int): ParquetQuery = {
    val names = spark.read.parquet(path).schema.fieldNames.take(n).toSeq
    copy(selectCols = Some(names))
  }

  /** WHERE clause in the v1 name-based predicate language (F4). */
  def where(expr: String): ParquetQuery =
    copy(predicate = Some(expr), predicateByIndex = false)

  /** WHERE clause in the v2 ordinal predicate language (`"92 > 10"` addresses
    * schema field 92; v2/src/main.rs:737).
    */
  def whereByIndex(expr: String): ParquetQuery =
    copy(predicate = Some(expr), predicateByIndex = true)

  /** Aggregates in the `OP(column)` grammar, evaluated in one pass (A5). */
  def aggregate(specs: String*): ParquetQuery = copy(aggregations = specs)

  /** v1-exact empty-input semantics: SUM()=0 instead of NULL (A1 divergence). */
  def exactReferenceSemantics: ParquetQuery = copy(referenceExact = true)

  /** Build the DataFrame (lazy; no job runs until an action). */
  def df: DataFrame = {
    val base = spark.read.parquet(path)
    val filtered = predicate match {
      case None => base
      case Some(p) =>
        val cond: Column =
          if (predicateByIndex) Predicates.columnByIndex(p, base.schema)
          else Predicates.column(p)
        base.filter(cond)
    }
    if (aggregations.nonEmpty) {
      val cols = Aggregations.compile(aggregations, referenceExact, Some(base.schema))
      filtered.agg(cols.head, cols.tail: _*)
    } else {
      selectCols.fold(filtered)(cs => filtered.select(cs.map(org.apache.spark.sql.functions.col): _*))
    }
  }
}
