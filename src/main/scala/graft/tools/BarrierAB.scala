package graft.tools

import graft.GraftSession
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** A/B of the staging-barrier primitive in the exact-Jaccard prefix join
  * ([[graft.operators.Dedup.stage]]): lazy `cache()` vs eager
  * `localCheckpoint`, at 10×/20× adversarial full replication (the
  * ScaleSmoke shape, where the staged sorted-sets table is corpus-sized —
  * exactly the case the x73 precedent says should favor the checkpoint).
  * Each variant runs twice per scale; the second run is the reported one
  * (first pays JIT/page-cache warm-up). Result and the chosen default are
  * recorded in BASELINE.md.
  */
object BarrierAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = Seq(10, 20)
    val spark = GraftSession.build("graft-barrier-ab",
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val base = GraftSession.table(spark, sfDir, "documents").select("doc_id", "text")

    def run(copies: Int, barrier: String): Double = {
      sys.props("graft.stage.barrier") = barrier
      val big = base
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0), lit(copies - 1))).as("i"))
        .select((col("doc_id") + col("i") * 1000000L).as("doc_id"), col("text"))
      val sh = Dedup.minhashSignature(big, k = 16, shingleN = 3)
        .select(col("doc_id"), col("shingles"))
      val t0 = System.nanoTime()
      Dedup.exactJaccardSelfPairs(sh, threshold = 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      sec
    }

    for (c <- scales; b <- Seq("cache", "checkpoint")) {
      run(c, b) // warm-up
      val sec = run(c, b)
      println(f"[barrier-ab] c=$c%2dx barrier=$b%-10s $sec%8.2f s")
    }
    sys.props.remove("graft.stage.barrier")
    spark.stop()
  }
}
