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
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("lbl").as("nbr_lbl"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), col("nbr_lbl")).as("lbl"),
          (col("nbr_lbl") < col("lbl")).as("changed"))
        .localCheckpoint(true)
      converged = next.where(col("changed")).limit(1).isEmpty
      labels = next.select("id", "lbl")
      round += 1
    }
    require(converged, s"components did not converge in $maxRounds rounds")
    labels.select(col("id"), col("lbl").as("rep_id"))
  }
}
