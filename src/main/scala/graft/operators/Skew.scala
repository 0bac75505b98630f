package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for 100 TB-scale shuffles. AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in the graft
  * session) handles sort-merge joins at runtime; these helpers cover the
  * two cases AQE does not: hash-aggregate hot keys and broadcast-unsafe
  * dimension joins against a skewed fact key.
  *
  * Both are pure plan rewrites — results are identical to the unsalted
  * operator (re-associated exact aggregates; replicated dim rows), which
  * the specs assert.
  */
object Skew {

  /** Two-stage salted aggregation: partial-aggregate on (key, salt) so one
    * hot key spreads over `buckets` reducers, then final-aggregate on the
    * key. Restricted to re-associatable exact aggregates (SUM of integral /
    * decimal, COUNT, MIN, MAX) — a salted double-SUM would change float
    * association order.
    *
    * The salt derives from `saltFrom` (any high-cardinality column, e.g.
    * the row's primary key) — deterministic, unlike rand().
    */
  def saltedSumCount(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltFrom: Column,
      buckets: Int): DataFrame = {
    // enforce the documented restriction instead of trusting the scaladoc:
    // a salted double/float SUM re-associates the additions and silently
    // diverges from the unsalted aggregate (the PrefixSum.runningTotal rule)
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    val vt = df.schema(valueCol).dataType
    require(vt != DoubleType && vt != FloatType,
      s"Skew.saltedSumCount: valueCol '$valueCol' is ${vt.simpleString}; " +
        "salting re-associates float addition — scale to fixed-point " +
        "integers or DECIMAL first")
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed fact key against a small-but-not-
    * broadcastable dimension: the fact side salts on `saltFrom`, the dim
    * side replicates each row `buckets` times. Join keys become
    * (key, salt) — a hot fact key now lands on `buckets` different
    * reducers instead of one.
    */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      saltFrom: Column,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}
