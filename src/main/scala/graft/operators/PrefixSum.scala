package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — the scalable form of
  * `SUM(...) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`, which Spark
  * plans as a SINGLE-partition window (the whole dataset through one
  * task). Two passes instead: range-partition on the order column,
  * per-partition window aggregates (each partition its own window group),
  * then one tiny driver-side pass over the P partition summaries produces
  * exclusive offsets that broadcast-join back. Driver state is P scalars —
  * the pattern holds at any data size.
  *
  * The same skeleton serves any associative combine: running SUM (token
  * budgets, ECDFs), running MIN and running MAX (the two halves of the
  * distributed CUSUM identity — a max-of-zero recursion rewrites to
  * prefix-sum minus clamped prefix-min / clamped prefix-max minus
  * prefix-sum). [[runningCombine]] is that skeleton, parameterized by the
  * monoid; the public entry points just pick one.
  *
  * Use: token-budget sharding (pack a corpus into ~equal-token shards in
  * stable id order), byte-budget file splitting, global row numbering,
  * change-detection ledgers.
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
      df: DataFrame, orderCol: String, cols: Seq[(String, String)]): DataFrame =
    runningCombine(df, orderCol, cols,
      Monoid(sum, _ + _, _ + _, unit = 0L, name = "runningTotals"))

  /** Adds `<out>` = inclusive running MINIMUM of `valueCol` in ascending
    * `orderCol` order — the second half of the distributed CUSUM identity
    * S_i = P_i − min(0, min_{j≤i} P_j) (a running max-of-zero recursion
    * rewrites to prefix-sum minus prefix-min, both of which distribute;
    * the recursion itself would be a sequential scan). Same two-pass shape
    * as [[runningTotals]]. Window-MIN NULL semantics: NULL values are
    * skipped; a row is NULL only when nothing non-null precedes it.
    */
  def runningMin(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame =
    runningCombine(df, orderCol, Seq(valueCol -> out),
      Monoid(min, least(_, _), math.min, unit = Long.MaxValue, name = "runningMin"))

  /** Inclusive running MAXIMUM — the mirror of [[runningMin]], and the
    * other half of TWO-SIDED CUSUM: the downward statistic is
    * S⁻_i = max(0, max_{j≤i} P_j) − P_i, a running max of the deviation
    * prefix sums (a sustained traffic DROP is as alarming as a burst).
    */
  def runningMax(df: DataFrame, orderCol: String, valueCol: String, out: String): DataFrame =
    runningCombine(df, orderCol, Seq(valueCol -> out),
      Monoid(max, greatest(_, _), math.max, unit = Long.MinValue, name = "runningMax"))

  /** An associative combine over Longs in its three guises: the window/
    * partition aggregate (`agg`), the column-level merge of a row's local
    * running value with its partition's exclusive offset (`merge` — must
    * satisfy merge(x, unit) == x so partitions with no prior values need
    * no special case), and the driver-side fold over partition summaries
    * (`fold`, seeded with `unit`).
    */
  private final case class Monoid(
      agg: Column => Column,
      merge: (Column, Column) => Column,
      fold: (Long, Long) => Long,
      unit: Long,
      name: String)

  /** The shared two-pass skeleton. Pass 1: range-partition on `orderCol`,
    * checkpoint (see below), per-partition window aggregate per value
    * column. Pass 2: collect the P (aggregate, non-null count) partition
    * summaries, fold them in pid order into exclusive offsets — O(P)
    * driver state — and broadcast-join the offsets back.
    */
  private def runningCombine(
      df: DataFrame, orderCol: String, cols: Seq[(String, String)],
      m: Monoid): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(cols.nonEmpty, s"PrefixSum.${m.name}: no value columns")
    for ((valueCol, _) <- cols) {
      val vt = df.schema(valueCol).dataType
      val integral = vt == ByteType || vt == ShortType || vt == IntegerType || vt == LongType
      require(integral,
        s"PrefixSum.${m.name}: valueCol '$valueCol' must be integral " +
          s"(got ${vt.simpleString}); scale doubles/decimals to fixed-point " +
          "integer units first")
    }
    // the checkpoint pins ONE set of range boundaries: repartitionByRange
    // samples its bounds per execution (reservoir seed varies with the RDD
    // id), so without a barrier the summaries job below and the output job
    // could place a boundary row in DIFFERENT partitions — its value would
    // be inside one pid's offset while the row carries another pid — and
    // the "exact" running aggregate would silently double-count or skip rows
    val parted = df
      .repartitionByRange(col(orderCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val w = Window.partitionBy("__pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = cols.zipWithIndex.foldLeft(parted) { case (d, ((v, _), i)) =>
      d.withColumn(s"__run$i", m.agg(col(v)).over(w).cast("long"))
    }
    // P partition (aggregate, non-null count) pairs per value column →
    // exclusive offsets; range partitioning assigns ascending pids to
    // ascending ranges, so offsets fold in pid order. Summaries come from
    // the aggregate of the VALUES (NOT the last row's running column,
    // which is wrong for SUM under negative values) and the non-null count
    // disambiguates "no prior values" from "prior values combining to the
    // unit" for the NULL-row semantics below.
    val aggExprs = cols.zipWithIndex.flatMap { case ((v, _), i) =>
      Seq(m.agg(col(v)).cast("long").as(s"__tot$i"), count(col(v)).as(s"__cnt$i"))
    }
    val totals = local.groupBy("__pid")
      .agg(aggExprs.head, aggExprs.tail: _*)
      .collect()
      .map(r => (r.getInt(0),
        cols.indices.map(i =>
          (if (r.isNullAt(1 + 2 * i)) m.unit else r.getLong(1 + 2 * i),
            r.getLong(2 + 2 * i)))))
      .sortBy(_._1)
    val accAgg = Array.fill(cols.length)(m.unit)
    val accCnt = Array.fill(cols.length)(0L)
    val offRows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    totals.foreach { case (pid, ts) =>
      offRows.add(org.apache.spark.sql.Row.fromSeq(
        pid +: cols.indices.flatMap(i => Seq(accAgg(i), accCnt(i)))))
      cols.indices.foreach { i =>
        accAgg(i) = m.fold(accAgg(i), ts(i)._1); accCnt(i) += ts(i)._2
      }
    }
    import org.apache.spark.sql.types.{StructField, StructType}
    import org.apache.spark.sql.types.{IntegerType => IT, LongType => LT}
    val offSchema = StructType(StructField("__pid", IT) +:
      cols.indices.flatMap(i => Seq(
        StructField(s"__off$i", LT), StructField(s"__offcnt$i", LT))))
    val spark = df.sparkSession
    val offDf = broadcast(spark.createDataFrame(offRows, offSchema))
    // window-aggregate semantics for NULL values: the running column skips
    // them, so a row in a leading all-NULL span still carries the prior
    // partitions' offset — and is NULL only when nothing non-null precedes
    // it anywhere. merge(x, unit) == x makes the "no prior partitions"
    // case fall out of the first branch with no extra guard.
    val joined = local.join(offDf, "__pid")
    cols.zipWithIndex.foldLeft(joined) { case (d, ((_, out), i)) =>
      d.withColumn(out,
        when(col(s"__run$i").isNotNull, m.merge(col(s"__run$i"), col(s"__off$i")))
          .when(col(s"__offcnt$i") > 0, col(s"__off$i"))
          .otherwise(lit(null)))
    }.drop("__pid" +: cols.indices.flatMap(i =>
      Seq(s"__run$i", s"__off$i", s"__offcnt$i")): _*)
  }
}
