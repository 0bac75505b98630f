package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
import org.apache.spark.sql.types.StructType

/** The reference aggregation spec grammar `OP(column)` with
  * OP ∈ SUM | AVG | COUNT | MIN | MAX, compiled to Spark aggregate Columns
  * (grammar: /root/reference/v1/src/main.rs:1209-1232; typed accumulators:
  * v1/src/main.rs:1283-1675).
  *
  * Semantics carried over:
  *  - COUNT(col) counts non-null values only (v1 skips nulls via `.flatten()`,
  *    v1/src/main.rs:1517) — identical to Spark's `count(col)`.
  *  - AVG/MIN/MAX are NULL on empty input (v1/src/main.rs:1527-1549) —
  *    identical to Spark.
  *  - SUM widens: int→i64, float→f64 (v1/src/main.rs:1399,1475). Spark widens
  *    the same way. One divergence: v1 returns SUM=0 on empty input (its
  *    accumulator starts at 0) while SQL/Spark return NULL; `referenceExact`
  *    requests the v1 behavior via coalesce.
  *
  * Each aggregate is aliased `op_column` (e.g. `sum_l_quantity`) so Spark and
  * DuckDB-oracle outputs share column names.
  */
object Aggregations {

  final case class Spec(op: String, column: String) {
    def alias: String = s"${op.toLowerCase}_$column"
  }

  def parse(input: String): Spec = {
    val tokens = Predicates.tokenize(input)
    require(
      tokens.length == 4 && tokens(1) == "(" && tokens(3) == ")",
      s"expected format OP(column), got: $input")
    val op = tokens(0)
    require(Set("SUM", "AVG", "COUNT", "MIN", "MAX").contains(op), s"invalid operation: $op")
    Spec(op, tokens(2))
  }

  /** Compile one spec. `referenceExact` → SUM of empty is 0 (like v1), not
    * NULL. The zero is typed to SUM's own result type (v1 returns a typed
    * i64/f64 zero, v1/src/main.rs:1399,1475): coalescing to DOUBLE would
    * change the output schema on non-empty input and round long sums above
    * 2^53. `schema` supplies the input column type; without it integral is
    * assumed (the reference's benchmark columns are i64).
    */
  def toColumn(
      spec: Spec,
      referenceExact: Boolean = false,
      schema: Option[StructType] = None): Column = {
    val c = col(spec.column)
    val agg = spec.op match {
      case "SUM" =>
        if (referenceExact) coalesce(sum(c), sumZero(spec.column, schema)) else sum(c)
      case "AVG"   => avg(c)
      case "COUNT" => count(c)
      case "MIN"   => min(c)
      case "MAX"   => max(c)
    }
    agg.as(spec.alias)
  }

  /** A zero literal of `sum(col)`'s result type: integral→LONG,
    * float/double→DOUBLE, DECIMAL(p,s)→DECIMAL(min(38,p+10),s).
    */
  private def sumZero(column: String, schema: Option[StructType]): Column =
    schema.flatMap(_.fields.find(_.name == column)).map(_.dataType) match {
      case Some(FloatType | DoubleType) => lit(0.0)
      case Some(d: DecimalType) =>
        lit(java.math.BigDecimal.ZERO)
          .cast(DecimalType(math.min(38, d.precision + 10), d.scale))
      case _ => lit(0L)
    }

  def compile(
      specs: Seq[String],
      referenceExact: Boolean = false,
      schema: Option[StructType] = None): Seq[Column] =
    specs.map(s => toColumn(parse(s), referenceExact, schema))

  /** SUM/AVG over a double column, made bit-exact and order-independent by
    * accumulating in DECIMAL(38,4) (exact, associative) and casting the final
    * scalar back to DOUBLE. Used by oracle-compared queries so Spark's
    * partial-aggregation order can never flip a low bit vs DuckDB.
    *
    * Scale 4 (not 10) matters: as long as the scaled-integer sum stays below
    * 2^53 the decimal→double conversion is exact in BOTH engines — at higher
    * scales DuckDB's two-step int128→double→÷10^s conversion can land 1 ulp
    * away from Java's correctly-rounded BigDecimal.doubleValue.
    */
  def exactSum(c: Column): Column = sum(c.cast(DecimalType(38, 4))).cast(DoubleType)
  def exactAvg(c: Column): Column = exactSum(c) / count(c)
}
