package graft.operators

import graft.SparkTestSession
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity against the reference's own benchmark query on its own schema:
  * the 92-column Snowset trace (/root/reference/v1/src/main.rs:1700-1793),
  * query template `SELECT first-cc columns WHERE memoryUsed > w` with
  * SUM/AVG/MIN/MAX/COUNT(memoryUsed) (v1/src/main.rs:218-230), and v2's
  * ordinal predicate `"53 > w"` — memoryUsed is schema index 53
  * (v1/src/main.rs:1754). A user of the reference can run their exact
  * query strings against this engine.
  */
class SnowsetParitySpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  /** First columns of the Snowset schema (v1/src/main.rs:1700-1713) + the
    * filter/aggregate column at its reference ordinal. Only the columns the
    * template touches need realistic types; the rest are padding up to
    * memoryUsed's index 53.
    */
  private val leading = Seq("queryId", "warehouseId", "databaseId")
  private val schema = StructType(
    leading.map(StructField(_, LongType)) ++
      (leading.size until 53).map(i => StructField(s"col$i", LongType)) :+
      StructField("memoryUsed", LongType))

  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("snowset").toString
    val rnd = new scala.util.Random(42)
    val rows = (0 until 20000).map { i =>
      Row.fromSeq(Seq(i.toLong, (i % 40).toLong, (i % 7).toLong) ++
        (leading.size until 53).map(_ => rnd.nextLong(1000)) :+ rnd.nextLong(1L << 40))
    }
    // 4 files, mirroring the reference's {folder}/{i}.parquet multi-file table
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
      .write.mode("overwrite").parquet(tmp)
    tmp
  }

  test("memoryUsed is at the v2 ordinal (53) in the generated schema") {
    schema.fieldNames(53) shouldBe "memoryUsed"
    schema.fields.length shouldBe 54
  }

  test("the v1 benchmark query runs verbatim: filter + 5 aggregates + -cc projection") {
    val w = 1L << 39 // ~50% retained
    val q = ParquetQuery(spark, dir)
      .selectFirst(3)
      .where(s"memoryUsed > $w")
      .aggregate("SUM(memoryUsed)", "AVG(memoryUsed)", "MIN(memoryUsed)",
        "MAX(memoryUsed)", "COUNT(memoryUsed)")
    val row = q.df.collect().head

    // oracle: same computation over the raw data
    val vals = spark.read.parquet(dir).select("memoryUsed")
      .collect().map(_.getLong(0)).filter(_ > w)
    row.getLong(0) shouldBe vals.sum
    row.getDouble(1) shouldBe vals.sum.toDouble / vals.length
    row.getLong(2) shouldBe vals.min
    row.getLong(3) shouldBe vals.max
    row.getLong(4) shouldBe vals.length.toLong
  }

  test("the v2 ordinal predicate addresses memoryUsed by index 53") {
    val w = 1L << 39
    val byIndex = ParquetQuery(spark, dir)
      .whereByIndex(s"53 > $w")
      .aggregate("COUNT(memoryUsed)")
      .df.collect().head.getLong(0)
    val byName = ParquetQuery(spark, dir)
      .where(s"memoryUsed > $w")
      .aggregate("COUNT(memoryUsed)")
      .df.collect().head.getLong(0)
    byIndex shouldBe byName
  }

  test("per-file aggregation (A7): one result row per parquet file") {
    // the reference's benchmark loop aggregates per file and concatenates
    // (v1/src/main.rs:139-156); Spark expresses that as a group on the
    // file the row came from
    import org.apache.spark.sql.functions._
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n"), sum("memoryUsed").as("sum_mem"))
      .collect()
    perFile.length shouldBe 4 // staged as 4 files like {folder}/{i}.parquet
    perFile.map(_.getLong(1)).sum shouldBe 20000L
  }

  test("workload-tier semantics: higher threshold retains fewer rows") {
    val counts = Seq(0L, 1L << 39, 1L << 41).map { w =>
      ParquetQuery(spark, dir).where(s"memoryUsed > $w")
        .aggregate("COUNT(memoryUsed)").df.collect().head.getLong(0)
    }
    counts shouldBe counts.sorted.reverse
    counts.last shouldBe 0L // best-case tier: above max ⇒ empty
  }
}
