package graft.metrics

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** I/O-selectivity instrumentation — the reference's first-class observable.
  *
  * v1 wraps the file handle in a `CountingReader` and reports bytes read,
  * selectivity (= bytes read / physical size), logical and physical throughput
  * (/root/reference/v1/src/main.rs:597-624,166-192); v2 sums streamed block
  * lengths (v2/src/main.rs:489-499,151-166). The Spark-native equivalent is
  * task-level `inputMetrics.bytesRead`/`recordsRead` collected by a listener —
  * granularity differs (Spark counts buffered reads incl. footers) so the bench
  * asserts monotonicity vs predicate threshold rather than byte-equality
  * (SURVEY.md §7 risk register).
  */
final class IoMetrics private (spark: SparkSession) {
  private val bytes = new LongAdder
  private val records = new LongAdder
  private val listener = new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.add(m.inputMetrics.bytesRead)
        records.add(m.inputMetrics.recordsRead)
      }
    }
  }

  def bytesRead: Long = bytes.sum()
  def recordsRead: Long = records.sum()

  private def attach(): Unit = spark.sparkContext.addSparkListener(listener)
  private def detach(): Unit = {
    // Listener events are posted asynchronously; drain before reading counters.
    org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
    spark.sparkContext.removeSparkListener(listener)
  }
}

object IoMetrics {

  final case class Report(
      bytesRead: Long,
      recordsRead: Long,
      physicalBytes: Long,
      elapsedSec: Double) {
    /** Fraction of the physical table actually read (v1/src/main.rs:183-184). */
    def selectivity: Double = if (physicalBytes == 0) 0.0 else bytesRead.toDouble / physicalBytes
    /** GB/s over the physical dataset size (v1/src/main.rs:172-175). */
    def physicalThroughputGBs: Double = physicalBytes / 1e9 / elapsedSec
    /** GB/s over bytes actually read (v1/src/main.rs:177-178). */
    def logicalThroughputGBs: Double = bytesRead / 1e9 / elapsedSec
    def toJson: String =
      f"""{"bytes_read":$bytesRead,"records_read":$recordsRead,"physical_bytes":$physicalBytes,""" +
        f""""elapsed_sec":$elapsedSec%.4f,"selectivity":$selectivity%.6f}"""
  }

  /** Run `action` with task-input metrics collected; returns (result, report). */
  def measure[A](spark: SparkSession, inputPaths: Seq[String])(action: => A): (A, Report) = {
    val m = new IoMetrics(spark)
    m.attach()
    val t0 = System.nanoTime()
    try {
      val out = action
      val elapsed = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusAccess.waitUntilEmpty(spark.sparkContext)
      (out, Report(m.bytesRead, m.recordsRead, physicalSize(inputPaths), elapsed))
    } finally m.detach()
  }

  /** On-disk bytes of the input files (recursive over directories). */
  def physicalSize(paths: Seq[String]): Long = {
    def size(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(size).sum).getOrElse(0L)
      else f.length()
    paths.map(p => size(new java.io.File(p))).sum
  }
}
