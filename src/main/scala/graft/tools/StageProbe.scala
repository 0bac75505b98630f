package graft.tools

import graft.GraftSession
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev tool: time x06's stages separately to find the bottleneck. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = GraftSession.table(spark, sfDir, "documents")
    val n = 12
    val winFold = (1 until n).foldLeft("element_at(cc, i)") {
      (acc, j) => s"(($acc * 31 + element_at(cc, i + $j)) % $Prime)"
    }
    val sets = docs
      .select(col("doc_id"), expr(charCodesExpr("text")).as("cc"))
      .select(col("doc_id"), expr(
        s"""array_distinct(CASE WHEN size(cc) >= $n
           |THEN transform(sequence(1, size(cc) - ${n - 1}), i -> $winFold)
           |ELSE array() END)""".stripMargin.replaceAll("\n", " ")).as("grams"))
    time("gram sets (count)")(sets.write.format("noop").mode("overwrite").save())
    val blocked = sets.select(col("doc_id"), col("grams"),
      size(col("grams")).as("ng"), array_min(col("grams")).as("block"))
    val pairs = blocked.as("a")
      .join(blocked.as("b"), col("a.block") === col("b.block")
        && col("a.doc_id") < col("b.doc_id"))
    val nPairs = time("pair count (no intersect)")(pairs.count())
    println(s"[probe] candidate pairs: $nPairs")
    val withInter = pairs
      .select(col("a.doc_id"), col("b.doc_id"),
        size(array_intersect(col("a.grams"), col("b.grams"))).as("inter"))
    time("pairs + intersect")(withInter.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
