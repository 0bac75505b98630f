package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair table — the consolidation step after
  * near-dup detection: pairs (a,b) form a graph, each component keeps one
  * canonical representative (its minimum id) and the rest are drops.
  * Extension beyond the reference surface; at corpus scale this is how
  * "A≈B, B≈C" collapses to one kept document instead of two.
  *
  * Min-label propagation to fixpoint: every vertex repeatedly takes the
  * minimum label over itself and its neighbors. Each round is one
  * equi-shuffle (join labels to the symmetrized edge list + min-aggregate);
  * rounds needed = graph diameter, which for near-dup graphs is tiny
  * (duplicate clusters are dense). The driver-side loop only reads a
  * scalar convergence count per round; all data work is distributed, and
  * each round's result is localCheckpoint'ed so lineage doesn't grow
  * O(rounds). (The classic large-star/small-star halves round count at
  * extreme diameters; plain propagation is the right trade for dedup
  * graphs.)
  */
object Components {

  /** Pairs (`idA`, `idB`) → (`id`, `rep_id`): one row per vertex appearing
    * in any pair, labeled with its component's minimum id.
    */
  def connectedComponents(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionByName(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    // labels only ever decrease, so the exact label sum is strictly
    // monotone until the fixpoint: one scalar aggregate per round replaces
    // a changed-flag join (decimal accumulation — a corpus-scale sum of
    // i64 ids overflows long)
    def labelSum(df: DataFrame): java.math.BigDecimal = df
      .agg(sum(col("lbl").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("lbl"))
        .unionByName(labels) // self: min over (self ∪ neighbors)
        .groupBy("id")
        .agg(min("lbl").as("lbl"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      round += 1
    }
    require(converged, s"components did not converge in $maxRounds rounds")
    labels.select(col("id"), col("lbl").as("rep_id"))
  }
}
