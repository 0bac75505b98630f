package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class ParquetQuerySpec extends AnyFunSuite {
  import SparkTestSession._

  private def li = s"$sf0001/lineitem.parquet"

  test("v1 template query: filter + 5 aggregates in one pass") {
    val row = ParquetQuery(spark, li)
      .where("l_extendedprice > 30000")
      .aggregate("SUM(l_quantity)", "AVG(l_quantity)", "MIN(l_quantity)",
        "MAX(l_quantity)", "COUNT(l_quantity)")
      .df.collect().head
    val cnt = row.getAs[Long]("count_l_quantity")
    assert(cnt > 0)
    assert(row.getAs[Double]("sum_l_quantity") / cnt == row.getAs[Double]("avg_l_quantity"))
    assert(row.getAs[Double]("min_l_quantity") <= row.getAs[Double]("max_l_quantity"))
  }

  test("filter is pushed down to the parquet scan (F5 row-group pruning path)") {
    val plan = ParquetQuery(spark, li)
      .where("l_quantity > 30.0")
      .aggregate("COUNT(l_quantity)")
      .df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"expected pushed filter in plan:\n$plan")
  }

  test("projection prunes the read schema to selected ∪ filter columns") {
    val plan = ParquetQuery(spark, li)
      .selectFirst(2)
      .where("l_quantity > 30.0")
      .df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double>"),
      s"expected pruned read schema in plan:\n$plan")
  }

  test("empty input: SQL semantics NULL, referenceExact SUM=0 (v1 divergence)") {
    val sqlRow = ParquetQuery(spark, li).where("l_quantity < 0.0")
      .aggregate("SUM(l_quantity)", "COUNT(l_quantity)").df.collect().head
    assert(sqlRow.isNullAt(0) && sqlRow.getAs[Long](1) == 0L)
    val refRow = ParquetQuery(spark, li).where("l_quantity < 0.0")
      .aggregate("SUM(l_quantity)", "COUNT(l_quantity)")
      .exactReferenceSemantics.df.collect().head
    assert(refRow.getAs[Double](0) == 0.0)
  }

  test("referenceExact SUM keeps the widened integral type (typed zero, not double)") {
    // v1 returns a typed i64 zero on empty input; coalescing to DOUBLE would
    // change the non-empty schema and round long sums above 2^53
    val empty = ParquetQuery(spark, li).where("l_orderkey < 0")
      .aggregate("SUM(l_orderkey)").exactReferenceSemantics.df
    assert(empty.schema.head.dataType == org.apache.spark.sql.types.LongType)
    assert(empty.collect().head.getLong(0) == 0L)
    val plain = ParquetQuery(spark, li).aggregate("SUM(l_orderkey)").df
    val exact = ParquetQuery(spark, li).aggregate("SUM(l_orderkey)").exactReferenceSemantics.df
    // same type; nullability legitimately tightens (coalesce can't be null)
    assert(exact.schema.head.dataType == plain.schema.head.dataType)
    assert(exact.collect().head.getLong(0) == plain.collect().head.getLong(0))
  }

  test("whereByIndex addresses schema ordinals") {
    val a = ParquetQuery(spark, li).whereByIndex("4 > 30").aggregate("COUNT(l_quantity)").df.collect().head
    val b = ParquetQuery(spark, li).where("l_quantity > 30").aggregate("COUNT(l_quantity)").df.collect().head
    assert(a == b)
  }
}
