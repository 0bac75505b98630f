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

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond") — O(log n) rounds on ANY graph, where min-label propagation
    * needs diameter rounds and a long chain stalls it. Dedup graphs are
    * dense clusters (use [[connectedComponents]]); this is the variant for
    * adversarial shapes. Both stars are expressed as joins against a
    * per-node min — no neighbor lists materialize, so a hub node costs a
    * wide join group, not a driver-sized array.
    *
    * Large-star: every neighbor v > u re-attaches to m(u) = min(N(u)∪{u});
    * small-star (on larger→smaller oriented edges): every v ≤ u and u
    * itself attach to m(u). Fixpoint ⇒ edges form stars (v, root).
    */
  def starContraction(
      pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
      maxRounds: Int = 64): DataFrame = {
    val spark = pairs.sparkSession
    var edges = pairs
      .select(col(idA).as("u"), col(idB).as("v"))
      .where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), sum(hash(col("u"), col("v")).cast("long"))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("u"), col("v"))
        .unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      sym.join(m, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // edges already oriented u > v
      val m = e.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      e.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct()
    }

    var sig = signature(edges)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)
        .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
        .distinct())
        .localCheckpoint(true)
      val nsig = signature(next)
      converged = nsig == sig
      sig = nsig
      edges = next
      round += 1
    }
    require(converged, s"star contraction did not converge in $maxRounds rounds")
    // fixpoint stars: (u > root) edges give member→rep; roots map to themselves
    val members = edges.select(col("u").as("id"), col("v").as("rep_id"))
    val roots = edges.select(col("v").as("id")).distinct()
      .join(members.select(col("id")), Seq("id"), "left_anti")
      .withColumn("rep_id", col("id"))
    // vertices whose only pairs were self-loops fell out with the u =!= v
    // filter; the contract ("one row per vertex appearing in any pair",
    // matching connectedComponents) still owes them a self-rep row
    val starred = members.unionByName(roots)
    val selfOnly = pairs.select(col(idA).as("id"))
      .unionByName(pairs.select(col(idB).as("id"))).distinct()
      .join(starred.select("id"), Seq("id"), "left_anti")
      .withColumn("rep_id", col("id"))
    starred.unionByName(selfOnly)
  }
}
