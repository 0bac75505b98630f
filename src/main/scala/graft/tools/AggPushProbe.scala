package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: which aggregate shapes push down to parquet footer stats. */
object AggPushProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.ui.enabled", "false").config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    spark.conf.set("spark.sql.sources.useV1SourceList",
      spark.conf.get("spark.sql.sources.useV1SourceList")
        .split(",").filterNot(_.trim == "parquet").mkString(","))
    val p = "/root/testdata/sf0.01/lineitem.parquet"
    Seq(
      "SELECT min(l_orderkey), max(l_orderkey), count(*) FROM t",
      "SELECT min(l_orderkey) FROM t",
      "SELECT count(*) FROM t").foreach { q =>
      spark.read.parquet(p).createOrReplaceTempView("t")
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      val pushed = "PushedAggregation: \\[[^\\]]*\\]".r.findFirstIn(plan).getOrElse("none")
      println(s"[probe] $q => $pushed")
    }
    spark.stop()
  }
}
