package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank in exact integer micro-units.
  *
  * Scores live in units of 1e-9 (a node's share of one total unit of rank),
  * and every per-iteration step is integer arithmetic: the damped pass-along
  * is `(score * 85) div 100`, the per-edge split is a further `div outdeg`,
  * and the receive side is an exact i64 sum. Nothing depends on float
  * accumulation order, so a DuckDB oracle replays the iterations
  * bit-for-bit — the same trick x27 uses for centroids. The cost is the
  * usual integer-division dust: each division floors, so a little mass
  * evaporates per hop (as it also does for dangling nodes); ranking order is
  * what the operator promises, not mass conservation.
  *
  * Each iteration is one co-partitioned join (scores onto edge sources) and
  * one shuffle aggregation (contributions by destination) — the standard
  * distributed PageRank step. Iterations are unrolled by the caller's
  * `iters`, not driver-side convergence probes, so the job graph is static.
  */
object PageRank {

  /** `edges`: (src, dst) long columns, pre-deduplicated. Returns
    * (node, score) after `iters` damped iterations from a uniform start.
    */
  def run(edges: DataFrame, iters: Int = 3): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
    val nn = nodes.agg(count(lit(1)).as("n"))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val init = nodes.crossJoin(nn)
      .select(col("node"), expr("CAST(1000000000 AS BIGINT) div n").as("score"))
    (1 to iters).foldLeft(init) { (score, _) =>
      val contrib = edges
        .join(score.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .groupBy("dst")
        .agg(sum(expr("((score * 85) div 100) div deg")).as("m"))
      nodes.crossJoin(nn)
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (expr("CAST(150000000 AS BIGINT) div n") + coalesce(col("m"), lit(0L))).as("score"))
    }
  }
}
