package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev tool: time a staged-index BUILD repeatedly with a fresh output dir
  * per rep (the catalog's stagedBuilds memoize per fixture dir, so Bench
  * rows can't be re-run in one JVM — this calls the Layouts builders
  * directly). args:
  * <ivf|ivf2|posting|minhash|jaccard|compact|rebuild_grown> <sfDir>
  * [reps]. Prints per-rep walls and the median, Bench-style
  * (cache-clear + GC between reps). `compact` times ONLY the
  * minhashCompact rebase over a per-rep fresh x155-shaped grown index
  * (gen-0 build + gen-1 ADMITTED append, both untimed); `rebuild_grown`
  * times the from-scratch build over the same grown corpus — together
  * the measured form of SCALING.md's O(index)-vs-O(corpus) rebase
  * claim.
  *
  * Each variant reproduces ITS bench row's exact inputs and knobs
  * (ExtensionCatalog's staged builders: posting over the full corpus,
  * the two ingest indexes over the EVEN doc half, all three with 256 KB
  * groups / 2000-row pages) — this tool exists to cross-check those
  * rows, so a mismatched corpus or layout knob would produce a wrong
  * parity verdict (review r14).
  */
object BuildTimer {
  def main(args: Array[String]): Unit = {
    val which = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.build("graft-buildtimer", cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val emb = GraftSession.table(spark, sfDir, "embeddings").where(col("vec_id") >= 10)
    // x101's posting index stages over the FULL corpus; the two ingest
    // indexes (x117/x139) stage over the even "existing" half
    val docs = GraftSession.table(spark, sfDir, "documents")
    val evenDocs = docs.where(col("doc_id") % 2 === 0)
    def freshOut(): String = java.nio.file.Files.createTempDirectory(
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target/graft-scratch")), s"buildtimer-$which").toString
    // grown-lifecycle fixtures for the maintenance-path timings: gen-0
    // base plus a gen-1 batch, the x153/x155 staging split
    val g0 = docs.where(col("doc_id") % 3 === 0)
    val g1 = docs.where(col("doc_id") % 3 === 1)
    val walls = (1 to reps).map { i =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val out = freshOut()
      // UNTIMED staging for the compact mode: the measurement is the
      // rebase alone, over a grown index prepared fresh per rep with
      // x155's EXACT lifecycle — gen-1 probed and only its ADMITTED
      // (kept) docs appended; appending all of g1 would time compaction
      // of a different, larger artifact than the bench row's (review r15)
      var rebuildInput: org.apache.spark.sql.DataFrame = null
      // checkpointed blocks accumulate across reps unless released (the
      // heap pressure the between-rep cache-clear exists to avoid —
      // ADVICE r15); collected at rep end, PageRank's LogicalRDD pattern
      val repCheckpoints = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      if (which == "compact") {
        graft.sources.Layouts.minhashIndex(g0, out,
          groupBytes = 256L * 1024, pageRows = 2000)
        val st1 = graft.operators.Dedup.incrementalDedupStaged(
          g1, out, "doc_id", "text", threshold = 0.5)
        val kept1 = g1.join(
          st1.where(col("status") === "kept").select("doc_id"), "doc_id")
          .localCheckpoint()
        repCheckpoints += kept1
        graft.sources.Layouts.minhashAppend(kept1, out,
          groupBytes = 256L * 1024, pageRows = 2000, batchId = Some("gen1"))
      }
      // rebuild_grown's input is the SAME admitted corpus the compact
      // mode's index holds (g0 ∪ kept1, derived untimed via a throwaway
      // gen-0 probe index) — a rebuild over all of g0 ∪ g1 would time a
      // larger build than the artifact compact rebases (review r15)
      if (which == "rebuild_grown") {
        val probeIdx = freshOut()
        graft.sources.Layouts.minhashIndex(g0, probeIdx,
          groupBytes = 256L * 1024, pageRows = 2000)
        val st1 = graft.operators.Dedup.incrementalDedupStaged(
          g1, probeIdx, "doc_id", "text", threshold = 0.5)
        rebuildInput = g0.union(g1.join(
          st1.where(col("status") === "kept").select("doc_id"), "doc_id"))
          .localCheckpoint()
        repCheckpoints += rebuildInput
        scala.reflect.io.Directory(new java.io.File(probeIdx)).deleteRecursively()
      }
      val t0 = System.nanoTime()
      which match {
        case "ivf" => graft.sources.Layouts.ivfIndex(emb, out,
          centModulo = 50, twoLevel = Some(false))
        case "ivf2" => graft.sources.Layouts.ivfIndex(emb, out,
          centModulo = 50, twoLevel = Some(true))
        case "posting" => graft.sources.Layouts.postingIndex(docs, out,
          groupBytes = 256L * 1024, pageRows = 2000)
        case "minhash" => graft.sources.Layouts.minhashIndex(evenDocs, out,
          groupBytes = 256L * 1024, pageRows = 2000)
        case "jaccard" => graft.sources.Layouts.jaccardIndex(evenDocs, out,
          groupBytes = 256L * 1024, pageRows = 2000)
        // the x155 A/B pair: the rebase alone (corpus never rescanned)
        // vs the from-scratch rebuild over the same grown corpus — the
        // measured form of SCALING.md's O(index) vs O(corpus) claim
        case "compact" => graft.sources.Layouts.minhashCompact(out,
          groupBytes = 256L * 1024, pageRows = 2000)(spark)
        case "rebuild_grown" => graft.sources.Layouts.minhashIndex(
          rebuildInput, out, groupBytes = 256L * 1024, pageRows = 2000)
        case other => sys.error(s"unknown build '$other'")
      }
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[buildtimer] rep $i: $w%.2f s")
      scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      repCheckpoints.foreach(_.queryExecution.optimizedPlan.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
      })
      w
    }
    val med = graft.metrics.Telemetry.median(walls)
    println(f"""{"build":"$which","median_sec":$med%.3f,"runs":[${walls.map(w => f"$w%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
