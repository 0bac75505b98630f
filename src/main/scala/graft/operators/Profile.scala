package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling for pipeline intake: per-column stats, rule
  * audits, and re-identification (k-anonymity) checks. Extension beyond the
  * reference surface — the reference trusts its fixture
  * (/root/reference/v1/src/main.rs:1700-1793 hard-codes the Snowset schema);
  * a 100 TB ingest cannot, so these are the gate a batch passes before it
  * enters the corpus.
  *
  * Scale design: every audit is ONE scan with map-side-combinable
  * aggregates. The row-per-column / row-per-rule shape is produced by
  * `stack` on the single aggregated row — driver-side width, never a
  * second pass over the data.
  */
object Profile {

  /** One row per column: null count + exact distinct count.
    *
    * Single scan: Catalyst rewrites the multi-column `count(DISTINCT ...)`
    * into one Expand (k× row multiplication, one column wide each) feeding
    * a two-phase aggregate — one shuffle total. The Expand factor is the
    * honest cost of EXACT distincts; the 100 TB variant swaps in
    * `approx_count_distinct` (HLL++, no Expand, mergeable sketch) once
    * exactness stops mattering for profiling.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        countDistinct(col(c)).as(s"nd_$c"))
    }
    val stackArgs = cols.map(c => s"'$c', `null_$c`, `nd_$c`").mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${cols.size}, $stackArgs) AS (column_name, n_null, n_distinct)")
  }

  /** Rule audit: `rules` maps a rule name to its VIOLATION predicate.
    * Output: one row per rule with the violation count, total rows, and
    * rate. NULL predicate results count as non-violations (same 3VL
    * behavior as SQL `CASE WHEN`), so a rule on a nullable column audits
    * only the rows it can judge — pair with an explicit IS NULL rule when
    * nulls themselves are the defect.
    */
  def constraintAudit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "constraintAudit needs at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"v_$name")
      }
    val stackArgs = rules.map { case (n, _) => s"'$n', `v_$n`" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(
        s"stack(${rules.size}, $stackArgs) AS (rule, n_violations)", "n_rows")
      .withColumn("violation_rate",
        col("n_violations").cast("double") / col("n_rows").cast("double"))
  }

  /** k-anonymity audit: group sizes over the quasi-identifier columns,
    * reported against each threshold in `ks` — how many QI groups (and how
    * many underlying rows) fall below k, i.e. are re-identifiable at that
    * strength. One shuffle on the QI key builds the size table; the
    * threshold sweep then runs on |groups| rows (explode by |ks|), which is
    * negligible next to the data.
    */
  def kAnonymity(df: DataFrame, qi: Seq[String], ks: Seq[Int]): DataFrame = {
    val sizes = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("n"))
    sizes
      .select(explode(array(ks.map(lit): _*)).as("k"), col("n"))
      .groupBy("k")
      .agg(
        count(lit(1)).as("n_groups"),
        sum(when(col("n") < col("k"), 1L).otherwise(0L)).as("groups_below"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L)).as("rows_below"))
      .orderBy("k")
  }
}
