package graft.tools

import graft.GraftSession
import graft.metrics.{BytePlanner, IoMetrics}
import graft.operators.ParquetQuery

/** CLI-compatible runner for the reference's v1 benchmark binary
  * (/root/reference/v1/src/main.rs:46-116): same flags, same fixed query
  * template, same reported metric set — a reference user can point their
  * invocation here.
  *
  *   -p <dir>      parquet folder (required)
  *   -w <thresh>   workload threshold for `<filter-col> > w` (default 0)
  *   -cc <n>       project the first n schema columns (default all)
  *   -c <tasks>    parallelism (⇒ local cores; default 16 like the reference)
  *   -s <MiB>      batch read size hint (⇒ columnar reader batch rows)
  *   -col <name>   filter/aggregate column (reference hard-wires
  *                 memoryUsed; fixtures default to l_extendedprice)
  *
  * Query shape (v1/src/main.rs:218-230): WHERE col > w with
  * SUM/AVG/MIN/MAX/COUNT(col), SELECT first -cc columns. Printed metrics
  * mirror v1/src/main.rs:166-192: bytes read, total time, total & logical
  * throughput, avg query time, selectivity — with bytes from the
  * metadata-only planner (Spark task bytesRead is unreliable on local
  * files; see BytePlanner).
  */
object V1Runner {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val path = opts.getOrElse("-p", sys.error("-p <parquet dir> is required"))
    val w = opts.getOrElse("-w", "0").toDouble
    val cores = opts.getOrElse("-c", "16").toInt
    val colName = opts.getOrElse("-col", "l_extendedprice")

    val spark = GraftSession.build("graft-v1-runner", cores = cores)
    opts.get("-s").foreach { mib =>
      // v1's -s is a byte-batch hint; the columnar analog is rows/batch
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize",
        math.max(128, mib.toInt * 256).toString)
    }

    // echo the predicate as understood (parse → print normalizes it)
    println(s"Predicate: ${graft.functions.Predicates.print(
      graft.functions.Predicates.parse(s"$colName > $w"))}")
    var q = ParquetQuery(spark, path)
      .where(s"$colName > $w")
      .aggregate(s"SUM($colName)", s"AVG($colName)", s"MIN($colName)",
        s"MAX($colName)", s"COUNT($colName)")
    opts.get("-cc").foreach(n => q = q.selectFirst(n.toInt))

    val (result, rep) = IoMetrics.measure(spark, Seq(path)) {
      q.df.collect().head
    }
    val plan = BytePlanner.plan(path, Seq(colName), Some(s"$colName > $w"))

    // v1/src/main.rs:166-192 metric block, planned bytes standing in for
    // the CountingReader byte tally
    val gb = 1e9
    println(f"Bytes read: ${plan.plannedBytes / gb}%.6f GB (planned; spark task metric: ${rep.bytesRead / gb}%.6f GB)")
    println(f"Total time: ${rep.elapsedSec}%.3f s")
    println(f"Total throughput: ${rep.physicalBytes / gb / rep.elapsedSec}%.4f GB/s")
    println(f"Logical throughput: ${plan.plannedBytes / gb / rep.elapsedSec}%.4f GB/s")
    println(f"Selectivity: ${plan.selectivity * 100}%.3f%% (${plan.survivingGroups}/${plan.rowGroups} row groups)")
    println(s"Aggregates: $result")
    spark.stop()
  }
}
