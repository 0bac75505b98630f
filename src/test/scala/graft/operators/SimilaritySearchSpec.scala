package graft.operators

import graft.{GraftSession, SparkTestSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class SimilaritySearchSpec extends AnyFunSuite with Matchers {

  test("spherical k-means iteration never decreases the summed-cosine objective") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    val e = spark.read.parquet(s"${SparkTestSession.sf0001}/embeddings.parquet")
    def objective(centroids: org.apache.spark.sql.DataFrame): Double = {
      import org.apache.spark.sql.expressions.Window
      val cent = broadcast(centroids.select(col("vec_id").as("cent_id"),
        col("embedding").as("centv"), SimilaritySearch.norm(col("embedding")).as("centn")))
      val w = Window.partitionBy("cid").orderBy(col("csim").desc, col("cent_id"))
      e.select(col("vec_id").as("cid"), col("embedding").as("cv"),
          SimilaritySearch.norm(col("embedding")).as("cn"))
        .crossJoin(cent)
        .select(col("cid"), col("cent_id"),
          (SimilaritySearch.dot(col("cv"), col("centv")) / col("cn") / col("centn")).as("csim"))
        .withColumn("r", org.apache.spark.sql.functions.row_number().over(w))
        .where(col("r") === 1)
        .agg(sum("csim")).collect().head.getDouble(0)
    }
    var cents = e.where(col("vec_id") % 25 === 0) // 2 seeds at sf0.001
    var prev = objective(cents)
    for (round <- 1 to 3) {
      cents = SimilaritySearch.kmeansIterate(e, cents).localCheckpoint(true)
      val cur = objective(cents)
      withClue(s"round $round: $prev -> $cur") {
        cur should be >= prev - 1e-9
      }
      prev = cur
    }
    // centroids keep the corpus shape and are unit-normalized
    val row = cents.collect().head
    row.getAs[Seq[Float]]("embedding").length shouldBe 64
    val n = math.sqrt(row.getAs[Seq[Float]]("embedding").map(v => v.toDouble * v).sum)
    n shouldBe 1.0 +- 1e-5
  }
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    GraftSession.table(spark, SparkTestSession.sf0001, "embeddings")

  test("cosine of a vector with itself is 1.0") {
    val cos = emb.limit(5)
      .select(SimilaritySearch.cosine($"embedding", $"embedding").as("c"))
      .as[Double].collect()
    all(cos) shouldBe 1.0 +- 1e-12
  }

  test("dot of mismatched-length arrays is NULL (malformed embedding must surface)") {
    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(SimilaritySearch.dot($"a", $"b").as("d")).collect().head
    bad.isNullAt(0) shouldBe true
    val ok = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
      .select(SimilaritySearch.dot($"a", $"b").as("d")).collect().head
    ok.getDouble(0) shouldBe 11.0
  }

  test("brute-force top-k returns k ranked neighbors per query, best first") {
    val out = SimilaritySearch.bruteForceTopK(
      emb.where($"vec_id" < 3), emb.where($"vec_id" >= 3), k = 4).collect()
    out.length shouldBe 12
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3))
      byRank.map(_.getInt(3)).toSeq shouldBe Seq(1, 2, 3, 4)
      val scores = byRank.map(_.getDouble(2)).toSeq
      scores shouldBe scores.sorted.reverse
    }
  }

  test("hyperplanes are distinct: bucket histogram is not {pattern, ~pattern}") {
    // Regression: the round-1 weight family (j*A + i*B) % P never wrapped P
    // for i < 64, so every plane was the same alternating ±1 hyperplane up
    // to sign — all vectors landed in one bucket or its complement. Real
    // 8-plane LSH over hundreds of unit vectors must spread far wider.
    val buckets = emb
      .select(SimilaritySearch.hyperplaneBucket("embedding", 8).as("b"))
      .distinct().count()
    buckets should be > 16L
  }

  test("LSH top-k is a subset of the full ranking and respects buckets") {
    val q = emb.where($"vec_id" < 5)
    val c = emb.where($"vec_id" >= 5)
    val lsh = SimilaritySearch.lshTopK(q, c, k = 3, planes = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    // every LSH result pair shares a hyperplane bucket with its query
    val buckets = emb
      .select($"vec_id", SimilaritySearch.hyperplaneBucket("embedding", 8).as("b"))
      .as[(Long, Long)].collect().toMap
    lsh.foreach { case (qid, cid) => buckets(qid) shouldBe buckets(cid) }
  }

  test("IVF assigns each corpus vector to exactly one list and returns ranked hits") {
    val q = emb.where($"vec_id" < 5)
    val c = emb.where($"vec_id" >= 5)
    val cent = emb.where($"vec_id" % 50 === 0)
    val out = SimilaritySearch.ivfTopK(q, c, cent, k = 3, nprobe = 2).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.map(_.getInt(3)).sorted.toSeq shouldBe (1 to rows.length)
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      scores shouldBe scores.sorted.reverse
    }
    // probing more cells can only improve the best hit (monotone recall)
    val one = SimilaritySearch.ivfTopK(q, c, cent, k = 1, nprobe = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val two = SimilaritySearch.ivfTopK(q, c, cent, k = 1, nprobe = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    two.foreach { case (qid, s2) => s2 should be >= one(qid) - 1e-12 }
  }

  test("brute-force plan broadcasts the query side (no corpus shuffle)") {
    val plan = SimilaritySearch.bruteForceTopK(
      emb.where($"vec_id" < 3), emb.where($"vec_id" >= 3), k = 4)
      .queryExecution.sparkPlan.toString
    plan should include("Broadcast")
  }

  test("semDedupScaled: one row per vector, exact duplicates collide and drop") {
    val spark = SparkTestSession.spark
    // plant exact duplicates: every vector re-appears under id + 100000 —
    // a duplicate MUST land in its twin's cell (identical cosine to every
    // centroid at every layer) and be dropped (cos = 1 ≥ tau, higher id)
    val dup = emb.select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.select("vec_id", "embedding").unionAll(dup)
    val out = SimilaritySearch.semDedupScaled(corpus, targetCellSize = 10, tau = 0.999)
    val rows = out.collect()
    rows.length shouldBe corpus.count() // ledger covers every vector
    val droppedIds = rows.filter(_.getBoolean(2)).map(_.getLong(1)).toSet
    val originals = emb.select("vec_id").as[Long].collect()
    originals.foreach { id => droppedIds should contain(id + 100000L) }
    originals.foreach { id => droppedIds should not contain id } // keeper = lower id
    // the knob holds: cells track the target size, not the corpus size
    val cellSizes = rows.groupBy(_.getLong(0)).map(_._2.length)
    cellSizes.max should be <= 10 * 12 // hash-sample variance bound, not n
  }

  test("argTop1 assignment equals the row_number window on adversarial ties") {
    // the top-1 aggregate (max_by over struct(score, −id)) replaced the
    // window in every assignment path; this pins the equivalence on a
    // randomized corpus SEEDED with the hard cases — exact-duplicate
    // vectors (cosine ties decided by centroid id) and scaled copies
    // (cosine-identical, different norms). A zero vector is excluded on
    // purpose: the ANSI session throws DIVIDE_BY_ZERO on a 0 norm in
    // BOTH forms identically, so there is no divergence to pin there.
    // Small integer components make exact cosine ties common, not rare.
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec(): Seq[Float] = Seq.fill(8)(rnd.nextInt(5).toFloat - 2f)
    val base = (0L until 300L).map(i => (i, vec()))
    val rows = base ++
      base.take(40).map { case (i, v) => (1000L + i, v) } ++            // exact dups
      base.take(40).map { case (i, v) => (2000L + i, v.map(_ * 3f)) }    // scaled copies
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = corpus.where(col("vec_id") % 7 === 0)
    val agg = SimilaritySearch.invertedLists(corpus, cents)
      .select("corpus_id", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the window form, rebuilt inline exactly as pre-round-11
    val cent = broadcast(cents.select(col("vec_id").as("cent_id"),
      col("embedding").as("centv"), SimilaritySearch.norm(col("embedding")).as("centn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cid").orderBy(col("csim").desc, col("cent_id"))
    val win = corpus.select(col("vec_id").as("cid"), col("embedding").as("cv"),
        SimilaritySearch.norm(col("embedding")).as("cn"))
      .crossJoin(cent)
      .select(col("cid"), col("cent_id"),
        (SimilaritySearch.dot(col("cv"), col("centv")) / col("cn") / col("centn")).as("csim"))
      .withColumn("r", row_number().over(w))
      .where(col("r") === 1)
      .select("cid", "cent_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    agg.size shouldBe win.size
    agg shouldBe win
    // the planted ties really exercised the tie-break: every exact dup
    // landed with its original
    base.take(40).foreach { case (i, _) => agg(1000L + i) shouldBe agg(i) }
  }
}
