package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training pipelines. RNG-based
  * `sample()`/`randomSplit()` are not replayable across engines, runs, or
  * partitionings; these operators decide membership from a HASH of the
  * row's id — pure map-side filters (no shuffle, no state), stable under
  * repartitioning, and exactly reproducible in the DuckDB oracle with the
  * same base-31 polyhash. Extension beyond the reference surface.
  *
  * The hash is uniform over [0, P); membership `hash % den < num`
  * approximates rate num/den with per-bucket exactness (a row's fate is a
  * pure function of its id — adding data never flips existing rows, the
  * property incremental corpus builds need).
  */
object Sampling {

  /** Purpose-salted bucket: each operator hashes `"<salt><id>"`, not the
    * bare id, so the bucketings are pairwise independent. Unsalted, a
    * stratum sampled at rate ≤ trainPct keeps only buckets < rate — all of
    * which `split` would then label 'train', starving val/test (and the
    * oracle replays the same bias, so only an independence spec catches it).
    */
  private def bucket(idCol: Column, den: Int, salt: String): Column =
    pmod(
      org.apache.spark.sql.graft.GraftFunctions.column(
        graft.functions.expressions.PolyHash(
          org.apache.spark.sql.graft.GraftFunctions.expression(
            concat(lit(salt), idCol.cast("string"))))),
      lit(den))

  /** Keep ~`num/den` of rows, decided by id hash. */
  def deterministicSample(df: DataFrame, idCol: String, num: Int, den: Int = 100): DataFrame =
    df.where(bucket(col(idCol), den, "sample:") < num)

  /** Per-stratum rates: `rates(stratum) = kept buckets of 100`. Strata
    * absent from the map are dropped — the downsample-overrepresented-
    * sources move in corpus curation.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String, rates: Map[String, Int]): DataFrame = {
    val rate = rates.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(bucket(col(idCol), 100, "strat:") < rate)
  }

  /** Disjoint-and-exhaustive train/val/test split: `split` labels each row
    * by its hash bucket against cumulative percentage bounds.
    */
  def split(df: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame = {
    val b = bucket(col(idCol), 100, "split:")
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
