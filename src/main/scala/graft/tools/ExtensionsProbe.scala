package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: the cluster-style registration path — a session built with
  * `spark.sql.extensions=graft.GraftExtensions` resolves graft_* in SQL
  * with no programmatic registration.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = spark.sql(
      """SELECT graft_poly_hash('abc') AS h,
        |graft_minhash_sig(graft_shingle_hashes(graft_token_hashes('a b c d e'), 3), 4) AS sig,
        |graft_intersect_size(array(1L,2L,3L), array(2L,3L,4L)) AS i""".stripMargin)
      .collect().head
    println(s"[ext] poly_hash=${r.getLong(0)} sig=${r.getSeq[Long](1).mkString(",")} inter=${r.getInt(2)}")
    spark.stop()
  }
}
