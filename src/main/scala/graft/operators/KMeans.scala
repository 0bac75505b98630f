package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact Lloyd iterations over quantized embeddings — k-means as a
  * fixed unrolled sequence of join + aggregate rounds (the x73/PageRank
  * rule: a static job graph, no driver loop deciding convergence from
  * collected data). Extension beyond the reference surface.
  *
  * Exactness: vectors are quantized once to a shifted integer ramp
  * q = round((x+1)·500) — translation preserves L2 argmins, the integer
  * domain makes every distance (Σ(q-c)²) and every centroid (Σq div n) an
  * exact i64, so partial-aggregation order can never flip an assignment
  * and the DuckDB oracle replays bit-identically.
  *
  * Scale shape per iteration: the centroid table is k×d rows (tiny —
  * broadcast); assignment expands each (vec, dim) pair k ways map-side and
  * partially aggregates (vec, cluster) sums before the one shuffle;
  * recompute is one more shuffle on (cluster, dim). No collect(), no
  * all-pairs anything; cost is n·d·k per round, the k-means floor.
  */
object KMeans {

  /** `iters` Lloyd refinements of per-label seed centroids; returns the
    * final assignment (vec_id, cluster, d2).
    */
  def assignInt(emb: DataFrame, iters: Int): DataFrame = {
    // (vec_id, label, dim, q) — consumed by every assign/recompute round;
    // the repeated scan+explode is cheap map work and ReuseExchange dedups
    // the shuffles, which measured faster than an explicit .cache()
    val el = emb.select(col("vec_id"), col("label"),
      posexplode(expr(
        "transform(embedding, x -> CAST(round((CAST(x AS DOUBLE) + 1.0d) * 500.0d) AS BIGINT))"))
        .as(Seq("dim", "q")))

    // seeds: per-label integer-mean centroids
    val seed = el.groupBy(col("label").as("cluster"), col("dim"))
      .agg(expr("sum(q) div count(1)").as("c"))

    def assign(centroids: DataFrame): DataFrame = {
      val d2 = el.join(centroids, "dim")
        .groupBy("vec_id", "cluster")
        .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
      d2.withColumn("rn", row_number().over(
          Window.partitionBy("vec_id").orderBy("d2", "cluster")))
        .where(col("rn") === 1)
        .select("vec_id", "cluster", "d2")
    }

    def recompute(assigned: DataFrame): DataFrame =
      el.join(assigned.select("vec_id", "cluster"), "vec_id")
        .groupBy("cluster", "dim")
        .agg(expr("sum(q) div count(1)").as("c"))

    (1 until iters).foldLeft(assign(seed)) { case (a, _) => assign(recompute(a)) }
  }

  /** Per-cluster summary of the final assignment: size, member-id checksum,
    * and inertia (Σ d² of members — the quantity Lloyd descends).
    */
  def summary(emb: DataFrame, iters: Int): DataFrame =
    assignInt(emb, iters)
      .groupBy("cluster")
      .agg(
        count(lit(1)).as("n_members"),
        sum("vec_id").as("id_checksum"),
        sum("d2").as("inertia"))
      .orderBy("cluster")
}
