package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — the scalable form of
  * `SUM(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`, which Spark
  * plans as a SINGLE-partition window (the whole dataset through one
  * task). Two passes instead: range-partition on the order column,
  * per-partition window sums (each partition its own window group), then
  * one tiny driver-side pass over the P partition totals produces
  * exclusive offsets that broadcast-join back. Driver state is P scalars —
  * the pattern holds at any data size.
  *
  * Use: token-budget sharding (pack a corpus into ~equal-token shards in
  * stable id order), byte-budget file splitting, global row numbering.
  */
object PrefixSum {

  /** Adds `<out>` = inclusive running total of `valueCol` in ascending
    * `orderCol` order, exact over the whole dataset. `orderCol` must be
    * globally unique (it is the total order). `valueCol` must be an
    * integral type: the partition offsets accumulate in a Long (exact);
    * fractional offsets would reintroduce the float-associativity drift
    * this operator exists to avoid — pre-scale to fixed-point integers
    * (e.g. micro-units) instead.
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame =
    runningTotals(df, orderCol, Seq(valueCol -> out))

  /** Multi-column form: one range partitioning, one checkpoint, and one
    * O(P) driver pass serve EVERY (valueCol → out) pair — the shape a
    * multi-series ECDF (x142's two cohorts) needs, at half the shuffle
    * and barrier cost of nesting single-column calls.
    */
  def runningTotals(
      df: DataFrame, orderCol: String, cols: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(cols.nonEmpty, "PrefixSum.runningTotals: no value columns")
    for ((valueCol, _) <- cols) {
      val vt = df.schema(valueCol).dataType
      val integral = vt == ByteType || vt == ShortType || vt == IntegerType || vt == LongType
      require(integral,
        s"PrefixSum.runningTotals: valueCol '$valueCol' must be integral " +
          s"(got ${vt.simpleString}); scale doubles/decimals to fixed-point " +
          "integer units first")
    }
    // the checkpoint pins ONE set of range boundaries: repartitionByRange
    // samples its bounds per execution (reservoir seed varies with the RDD
    // id), so without a barrier the totals job below and the output job
    // could place a boundary row in DIFFERENT partitions — its value would
    // be inside one pid's offset while the row carries another pid — and
    // the "exact" running total would silently double-count or skip rows
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.zipWithIndex.foldLeft(parted) { case (d, ((v, _), i)) =>
      d.withColumn(s"__run$i", sum(col(v)).over(w))
    }
    // P partition (total, non-null count) pairs per value column →
    // exclusive offsets; range partitioning assigns ascending pids to
    // ascending ranges, so offsets accumulate in pid order. Totals come
    // from SUM of the values (NOT the max of the running column, which is
    // wrong under negative values) and the non-null count disambiguates
    // "no prior values" from "prior values summing to zero" for the
    // NULL-row semantics below.
    val aggExprs = cols.zipWithIndex.flatMap { case ((v, _), i) =>
      Seq(coalesce(sum(col(v)), lit(0L)).as(s"__tot$i"), count(col(v)).as(s"__cnt$i"))
    }
    val totals = local.groupBy("__pid")
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
      .map(r => (r.getInt(0),
        cols.indices.map(i => (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i)))))
      .sortBy(_._1)
    val accSum = Array.fill(cols.length)(0L)
    val accCnt = Array.fill(cols.length)(0L)
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    totals.foreach { case (pid, ts) =>
      offRows.add(org.apache.spark.sql.Row.fromSeq(
        pid +: cols.indices.flatMap(i => Seq(accSum(i), accCnt(i)))))
      cols.indices.foreach { i => accSum(i) += ts(i)._1; accCnt(i) += ts(i)._2 }
    }
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    import org.apache.spark.sql.types.{LongType => LT}
    val offSchema = StructType(StructField("__pid", IntegerType) +:
      cols.indices.flatMap(i => Seq(
        StructField(s"__off$i", LT), StructField(s"__offcnt$i", LT))))
    val spark = df.sparkSession
    val offDf = broadcast(spark.createDataFrame(offRows, offSchema))
    // window-SUM semantics for NULL values: the running total skips them,
    // so a row in a leading all-NULL span still carries the prior
    // partitions' total — and is NULL only when nothing non-null precedes
    // it anywhere
    val joined = local.join(offDf, "__pid")
    cols.zipWithIndex.foldLeft(joined) { case (d, ((_, out), i)) =>
      d.withColumn(out,
        when(col(s"__run$i").isNotNull, col(s"__run$i") + col(s"__off$i"))
          .when(col(s"__offcnt$i") > 0, col(s"__off$i"))
          .otherwise(lit(null)))
    }.drop("__pid" +: cols.indices.flatMap(i =>
      Seq(s"__run$i", s"__off$i", s"__offcnt$i")): _*)
  }

  /** Adds `<out>` = inclusive running MINIMUM of `valueCol` in ascending
    * `orderCol` order — the second half of the distributed CUSUM identity
    * S_i = P_i − min(0, min_{j≤i} P_j) (a running max-of-zero recursion
    * rewrites to prefix-sum minus prefix-min, both of which distribute;
    * the recursion itself would be a sequential scan). Same two-pass shape
    * as [[runningTotals]]: range-partition on the (globally unique) order
    * column, per-partition window mins, then one O(P) driver pass turns
    * the P partition minimums into exclusive prefix-min offsets that
    * broadcast-join back. Window-MIN NULL semantics: NULL values are
    * skipped; a row is NULL only when nothing non-null precedes it.
    */
  def runningMin(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame =
    runningExtreme(df, orderCol, valueCol, out, isMin = true)

  /** Inclusive running MAXIMUM — the mirror of [[runningMin]], and the
    * other half of TWO-SIDED CUSUM: the downward statistic is
    * S⁻_i = max(0, max_{j≤i} P_j) − P_i, a running max of the deviation
    * prefix sums (a sustained traffic DROP is as alarming as a burst).
    */
  def runningMax(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame =
    runningExtreme(df, orderCol, valueCol, out, isMin = false)

  private def runningExtreme(
      df: DataFrame, orderCol: String, valueCol: String, out: String,
      isMin: Boolean): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val vt = df.schema(valueCol).dataType
    require(vt == ByteType || vt == ShortType || vt == IntegerType || vt == LongType,
      s"PrefixSum.running${if (isMin) "Min" else "Max"}: valueCol '$valueCol' " +
        s"must be integral (got ${vt.simpleString}); scale to fixed-point " +
        "integer units first")
    def ext(c: org.apache.spark.sql.Column) = if (isMin) min(c) else max(c)
    def pick(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      if (isMin) least(a, b) else greatest(a, b)
    val unit = if (isMin) Long.MaxValue else Long.MinValue
    // same barrier rationale as runningTotals: ONE set of range bounds
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__runext",
      ext(col(valueCol)).over(w).cast("long"))
    val totals = local.groupBy("__pid")
      .agg(ext(col(valueCol)).cast("long").as("__ext"), count(col(valueCol)).as("__cnt"))
      .collect()
      .map(r => (r.getInt(0),
        if (r.isNullAt(1)) unit else r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var accExt = unit
    var accCnt = 0L
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    totals.foreach { case (pid, e, cnt) =>
      offRows.add(org.apache.spark.sql.Row(pid, accExt, accCnt))
      accExt = if (isMin) math.min(accExt, e) else math.max(accExt, e)
      accCnt += cnt
    }
    import org.apache.spark.sql.types.{StructField, StructType}
    import org.apache.spark.sql.types.{IntegerType => IT, LongType => LT}
    val offSchema = StructType(Seq(StructField("__pid", IT),
      StructField("__offext", LT), StructField("__offcnt", LT)))
    val spark = df.sparkSession
    val offDf = broadcast(spark.createDataFrame(offRows, offSchema))
    local.join(offDf, "__pid")
      .withColumn(out,
        when(col("__runext").isNotNull && col("__offcnt") > 0,
          pick(col("__runext"), col("__offext")))
          .when(col("__runext").isNotNull, col("__runext"))
          .when(col("__offcnt") > 0, col("__offext"))
          .otherwise(lit(null)))
      .drop("__pid", "__runext", "__offext", "__offcnt")
  }
}
