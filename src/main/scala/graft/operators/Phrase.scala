package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact-PHRASE retrieval over the persisted positional index
  * ([[graft.sources.Layouts.positionalIndex]]) — the operator behind
  * phrase-level eval-set decontamination and quote detection, which
  * bag-of-words retrieval (x52/x178) cannot express.
  *
  * The probe is slot algebra, never a string rescan: each phrase slot i
  * matching term t at position p votes for a candidate occurrence
  * STARTING at p − i; a start that collects all |phrase| distinct slots
  * in one doc is an exact occurrence. Cost model at 100 TB: the index
  * scan prunes to the phrase's terms' row groups (`In(term, ...)`), the
  * slot table is a broadcast of |phrase| rows, and the only shuffle is
  * keyed on (doc_id, start) over the MATCHING postings — O(matching
  * postings), never O(corpus). Overlapping occurrences ("a a a" contains
  * "a a" twice) and repeated-term phrases fall out of the same algebra:
  * one posting row may vote for several slots, each under its own start.
  */
object Phrase {

  /** (doc_id, n_occ): exact occurrence count of `phrase` per document
    * containing it at least once.
    *
    * Multi-term phrases intersect RAREST TERM FIRST before the
    * adjacency shuffle: every occurrence doc must contain every phrase
    * term, so semi-joining the other terms' postings against the rarest
    * term's doc set shrinks the (doc_id, start) shuffle from
    * Σ(term dfs) to ≤ |phrase| · min(term df) rows — the lever that
    * keeps a stop-word-heavy phrase priced at its RAREST term, not its
    * commonest (the positional analog of the BM25 champion tier). The
    * per-term df feeding the choice is an aggregate over the
    * already-pruned rows whose result is ≤ |phrase| rows (a bounded
    * collect, like the probes' 1-row meta reads) — never an index pass;
    * a phrase term absent from the corpus short-circuits to the empty
    * result before any shuffle runs.
    */
  def occurrences(
      spark: SparkSession,
      indexPath: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    implicit val s: SparkSession = spark
    import spark.implicits._
    val slots = broadcast(
      phrase.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("slot", "term"))
    val distinctTerms = phrase.distinct
    val post = spark.read
      .parquet(graft.sources.Layouts.indexRoot(indexPath))
      .where(col("term").isin(distinctTerms: _*))
      .select("term", "doc_id", "pos")
    val scoped =
      if (distinctTerms.length <= 1) post
      else {
        val dfs = post.groupBy("term")
          .agg(countDistinct("doc_id").as("df")).collect()
        if (dfs.length < distinctTerms.length) post.limit(0)
        else {
          val rarest = dfs
            .minBy(r => (r.getLong(1), r.getString(0))).getString(0)
          post.join(
            post.where(col("term") === rarest).select("doc_id").distinct(),
            Seq("doc_id"), "left_semi")
        }
      }
    scoped.join(slots, "term")
      .select(col("doc_id"), (col("pos") - col("slot")).as("start"),
        col("slot"))
      .groupBy("doc_id", "start")
      .agg(countDistinct("slot").as("k"))
      .where(col("k") === phrase.length)
      .groupBy("doc_id").agg(count(lit(1)).as("n_occ"))
  }

  /** Top-k documents by (occurrence count desc, doc_id) with an explicit
    * rank column. The global cut is orderBy+limit (TakeOrderedAndProject
    * — per-partition top-k, no full sort); the rank window then runs
    * over at most k rows.
    */
  def topK(
      spark: SparkSession,
      indexPath: String,
      phrase: Seq[String],
      k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("n_occ"), asc("doc_id"))
    occurrences(spark, indexPath, phrase)
      .orderBy(desc("n_occ"), asc("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select("rank", "doc_id", "n_occ")
      .orderBy("rank")
  }

  /** Contamination audit: for each phrase, (n_docs, n_occ) over the
    * corpus — ONE pruned index probe for all phrases at once (the slot
    * table carries a phrase id and its length; adjacency verifies per
    * (phrase, doc, start)). Phrases with zero occurrences produce no
    * row, matching a SQL replay's inner-grouped shape. The single-probe
    * design trades [[occurrences]]' per-phrase rarest-term intersection
    * for one shared index scan — right when the phrase list is long and
    * its terms rare (the decontamination case); a lone stop-word-heavy
    * phrase is better served through [[occurrences]].
    */
  def audit(
      spark: SparkSession,
      indexPath: String,
      phrases: Seq[Seq[String]]): DataFrame = {
    require(phrases.nonEmpty && phrases.forall(_.nonEmpty),
      "audit needs at least one non-empty phrase")
    implicit val s: SparkSession = spark
    import spark.implicits._
    val slots = broadcast(phrases.flatMap { p =>
      p.zipWithIndex.map { case (t, i) =>
        (p.mkString(" "), i.toLong, t, p.length.toLong) }
    }.toDF("phrase", "slot", "term", "plen"))
    val terms = phrases.flatten.distinct
    val post = spark.read
      .parquet(graft.sources.Layouts.indexRoot(indexPath))
      .where(col("term").isin(terms: _*))
      .select("term", "doc_id", "pos")
    post.join(slots, "term")
      .select(col("phrase"), col("doc_id"),
        (col("pos") - col("slot")).as("start"), col("slot"), col("plen"))
      .groupBy("phrase", "doc_id", "start")
      .agg(countDistinct("slot").as("k"), max("plen").as("plen"))
      .where(col("k") === col("plen"))
      .groupBy("phrase")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .orderBy("phrase")
  }
}
