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
    * globally unique (it is the total order).
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame = {
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("__run", sum(col(valueCol)).over(w))
    // P partition totals → exclusive offsets; range partitioner assigns
    // ascending pids to ascending ranges, so offsets accumulate in pid order
    // coalesce: a partition whose values are all NULL has a NULL running
    // max (SUM skips nulls) and contributes nothing to later offsets
    val totals = local.groupBy("__pid")
      .agg(coalesce(max("__run"), lit(0L)).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, tot) =>
      val off = acc; acc += tot; (pid, off)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__pid", "__off"))
    local.join(offDf, "__pid")
      .withColumn(out, col("__run") + col("__off"))
      .drop("__pid", "__run", "__off")
  }
}
