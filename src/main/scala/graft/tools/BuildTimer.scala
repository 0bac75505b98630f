package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev tool: time a staged-index BUILD repeatedly with a fresh output dir
  * per rep (the catalog's stagedBuilds memoize per fixture dir, so Bench
  * rows can't be re-run in one JVM — this calls the Layouts builders
  * directly). args: <ivf|ivf2|posting|minhash|jaccard> <sfDir> [reps].
  * Prints per-rep walls and the median, Bench-style (cache-clear + GC
  * between reps).
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
    val docs = GraftSession.table(spark, sfDir, "documents")
    def freshOut(): String = java.nio.file.Files.createTempDirectory(
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("target/graft-scratch")), s"buildtimer-$which").toString
    val walls = (1 to reps).map { i =>
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val out = freshOut()
      val t0 = System.nanoTime()
      which match {
        case "ivf" => graft.sources.Layouts.ivfIndex(emb, out,
          centModulo = 50, twoLevel = Some(false))
        case "ivf2" => graft.sources.Layouts.ivfIndex(emb, out,
          centModulo = 50, twoLevel = Some(true))
        case "posting" => graft.sources.Layouts.postingIndex(docs, out)
        case "minhash" => graft.sources.Layouts.minhashIndex(docs, out)
        case "jaccard" => graft.sources.Layouts.jaccardIndex(docs, out)
        case other => sys.error(s"unknown build '$other'")
      }
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[buildtimer] rep $i: $w%.2f s")
      scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      w
    }
    val s = walls.sorted
    println(f"""{"build":"$which","median_sec":${s(reps / 2)}%.3f,"runs":[${walls.map(w => f"$w%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
