package graft.tools

import graft.GraftSession
import graft.queries.QueryCatalog
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` plans of named catalog queries
  * to `plans/<tag>/<name>_<suffix>.txt` — the before/after plan evidence an
  * optimization round commits. args: <tag> <suffix> <name>[,<name>...]
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <names,comma-separated>")
    val (tag, suffix) = (args(0), args(1))
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = GraftSession.build("graft-plansnap", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val byName = QueryCatalog.all.map(e => e.name -> e).toMap
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { n =>
      val e = byName.getOrElse(n, sys.error(s"unknown query '$n'"))
      val plan = e.build(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$tag/${n}_$suffix.txt"), plan)
      println(s"[plansnap] wrote plans/$tag/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
