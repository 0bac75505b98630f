package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row at or
  * before its time, per key — the temporal-attribution operator every
  * event pipeline needs (DuckDB ships it as `ASOF JOIN`; Spark has no
  * built-in). Extension beyond the reference surface, same data model.
  *
  * Spark-first shape: NOT a range join (which Catalyst would plan as a
  * broadcast-nested-loop over the inequality) but the union-window
  * formulation — tag both sides, union, and carry the last right payload
  * forward with `last(_, ignoreNulls)` over a (key, time) window. One
  * shuffle on the key, sort within partitions, zero data replication;
  * at 100 TB both sides stream through a single sort-merge pass, and a
  * hot key degrades to one sorted partition rather than a pair blow-up.
  *
  * Determinism: right rows sort before left rows at equal times (so
  * "at-or-before" includes ties), and equal-time right rows resolve to
  * the highest tie-break value — fix the tie column to make results
  * replayable.
  */
object AsOfJoin {

  /** `left` gains `asof_<c>` for each carried right column (all NULL when
    * no right row precedes it). The carried columns travel as ONE struct,
    * so a NULL inside a right row can never tear the match across
    * different right rows. `leftTime`/`rightTime` must be mutually
    * comparable (use integral epoch units).
    */
  def lastPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      carry: Seq[String],
      rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryStruct = struct(carry.map(col): _*)
    val carryType = right.select(carryStruct.as("c")).schema("c").dataType
    // the tie column keeps its OWN type: casting to long silently nulls a
    // non-numeric tie-break (every equal-time row ties, order becomes
    // partition-dependent) and truncates fractional ones — ordering on the
    // raw column is deterministic for any orderable type
    val tieType = right.schema(rightTieBreak).dataType
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__carry", lit(null).cast(carryType))
      .select(Seq(col(key), col("__t"), col("__side"), col("__tie"), col("__carry")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    // a NULL rightTime would sort FIRST under ascending nulls-first and be
    // carried as a phantom "prior" match into left rows that have no true
    // predecessor — a right row with no timestamp can never be the most
    // recent row at-or-before anything, so it is excluded up front. (Left
    // rows with NULL leftTime sort first too, see nothing prior, and get
    // the documented all-NULL result.)
    val r = right
      .where(col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", col(rightTieBreak))
      .withColumn("__carry", carryStruct)
      .select(Seq(col(key), col("__t"), col("__side"), col("__tie"), col("__carry")) ++
        leftCols.filterNot(_ == key)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // right-before-left at equal __t ⇒ inclusive as-of; ascending __tie ⇒
    // the LAST equal-time right row carries the max tie-break
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last("__carry", ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ carry.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }
}
