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
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val vt = df.schema(valueCol).dataType
    val integral = vt == ByteType || vt == ShortType || vt == IntegerType || vt == LongType
    require(integral,
      s"PrefixSum.runningTotal: valueCol '$valueCol' must be integral " +
        s"(got ${vt.simpleString}); scale doubles/decimals to fixed-point " +
        "integer units first")
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
    val local = parted.withColumn("__run", sum(col(valueCol)).over(w))
    // P partition (total, non-null count) pairs → exclusive offsets; range
    // partitioning assigns ascending pids to ascending ranges, so offsets
    // accumulate in pid order. Totals come from SUM of the values (NOT the
    // max of the running column, which is wrong under negative values) and
    // the non-null count disambiguates "no prior values" from "prior
    // values summing to zero" for the NULL-row semantics below.
    val totals = local.groupBy("__pid")
      .agg(coalesce(sum(valueCol), lit(0L)).as("__tot"), count(valueCol).as("__cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var accSum = 0L
    var accCnt = 0L
    val offsets = totals.map { case (pid, tot, cnt) =>
      val o = (pid, accSum, accCnt)
      accSum += tot; accCnt += cnt
      o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off", "__offcnt"))
    // window-SUM semantics for NULL values: the running total skips them,
    // so a row in a leading all-NULL span still carries the prior
    // partitions' total — and is NULL only when nothing non-null precedes
    // it anywhere
    local.join(offDf, "__pid")
      .withColumn(out,
        when(col("__run").isNotNull, col("__run") + col("__off"))
          .when(col("__offcnt") > 0, col("__off"))
          .otherwise(lit(null)))
      .drop("__pid", "__run", "__off", "__offcnt")
  }
}
