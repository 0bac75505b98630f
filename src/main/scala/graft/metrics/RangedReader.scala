package graft.metrics

import graft.functions.Predicates
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Ranged-read EXECUTOR for [[BytePlanner]] plans — the second half of the
  * v2 engine (/root/reference/v2/src/main.rs:400-499): where BytePlanner
  * reports what a pruned scan WOULD read, this performs the reads and
  * reports what it DID read, closing the loop between the metadata-only
  * plan and real I/O.
  *
  * Mechanics follow the reference: each surviving column chunk contributes
  * its (offset, length) byte range, the footer (length word + magic
  * included) contributes one more, ranges sort by offset and touching or
  * overlapping neighbours merge into one seek (`merge_chunks`,
  * v2/src/main.rs:505-525 — S6 range coalescing; gaps do NOT merge, a
  * near-storage engine never ships bytes the plan excluded), and each
  * merged range streams through positioned 512 KiB block reads
  * (v2/src/main.rs:420-499, BLOCK_SIZE at :52). Because column chunks
  * within a row group are laid out back-to-back, coalescing typically
  * collapses a projected scan to one contiguous range per surviving
  * group — sequential I/O, not a seek per chunk.
  *
  * Invariant (spec-checked, and asserted per sweep row in TierBench):
  * bytes actually read == BytePlanner.plannedBytes, exactly — both sides
  * count surviving chunk bytes + footer bytes, and coalescing only fuses
  * adjacency, never admits gap bytes. On object storage each merged range
  * maps to one GET with an HTTP Range header; block size then trades
  * request count against time-to-first-byte, which is why it is a
  * parameter and not hard-coded at the v2 value.
  */
object RangedReader {

  /** v2 BLOCK_SIZE (v2/src/main.rs:52). */
  val DefaultBlockSize: Int = 512 * 1024

  final case class ByteRange(offset: Long, length: Long)

  final case class FileRead(
      path: String,
      ranges: Int,
      bytesRead: Long)

  final case class Report(files: Seq[FileRead], elapsedSec: Double) {
    def bytesRead: Long = files.map(_.bytesRead).sum
    def ranges: Int = files.map(_.ranges).sum
    def gbps: Double = if (elapsedSec == 0) 0.0 else bytesRead / elapsedSec / 1e9
  }

  /** Sort by offset and merge touching/overlapping ranges — the reference's
    * `merge_chunks` (v2/src/main.rs:505-525). Gap-free adjacency only.
    */
  def coalesce(ranges: Seq[ByteRange]): Seq[ByteRange] = {
    if (ranges.isEmpty) return ranges
    val sorted = ranges.sortBy(_.offset)
    val out = Seq.newBuilder[ByteRange]
    var cur = sorted.head
    sorted.tail.foreach { r =>
      if (r.offset <= cur.offset + cur.length)
        cur = ByteRange(cur.offset,
          math.max(cur.offset + cur.length, r.offset + r.length) - cur.offset)
      else { out += cur; cur = r }
    }
    out += cur
    out.result()
  }

  /** Byte ranges a pruned scan of `columns` under `predicate` must read
    * from one parquet file: surviving chunks (row groups kept by the same
    * min/max interval logic BytePlanner uses) plus the footer, coalesced.
    */
  def planRanges(file: String, columns: Seq[String], predicate: Option[String]): Seq[ByteRange] = {
    val expr = predicate.map(Predicates.parse)
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val footerLen = BytePlanner.readFooterLength(file)
      val fileLen = new java.io.File(file).length()
      val wanted: ColumnChunkMetaData => Boolean =
        if (columns.isEmpty) _ => true
        else c => columns.contains(c.getPath.toDotString)
      val chunkRanges = blocks.filter { b =>
        val stats = b.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
        expr.forall(e => BytePlanner.keepRowGroup(e, stats, not = false))
      }.flatMap(_.getColumns.asScala.filter(wanted))
        .map(c => ByteRange(c.getStartingPos, c.getTotalSize))
      // footer + 4-byte length word + PAR1 magic, same accounting as
      // BytePlanner.footerBytes
      coalesce(chunkRanges :+ ByteRange(fileLen - footerLen - 8, footerLen + 8))
    } finally reader.close()
  }

  /** Stream `ranges` of `file` through positioned `blockSize` reads,
    * returning bytes read (the v2 unfold loop, v2/src/main.rs:424-499).
    * The block buffer is reused across ranges like the reference's.
    */
  def readRanges(file: String, ranges: Seq[ByteRange],
      blockSize: Int = DefaultBlockSize): Long = {
    val raf = new java.io.RandomAccessFile(file, "r")
    val buf = new Array[Byte](blockSize)
    var bytes = 0L
    try {
      ranges.foreach { r =>
        raf.seek(r.offset)
        var remaining = r.length
        while (remaining > 0) {
          val toRead = math.min(remaining, blockSize.toLong).toInt
          raf.readFully(buf, 0, toRead)
          bytes += toRead
          remaining -= toRead
        }
      }
      bytes
    } finally raf.close()
  }

  /** Plan + execute a pruned ranged scan over a parquet file or directory;
    * the executable analog of `BytePlanner.plan(path, columns, predicate)`.
    */
  def run(path: String, columns: Seq[String], predicate: Option[String],
      blockSize: Int = DefaultBlockSize): Report = {
    // BytePlanner's own (recursive) listing: a partition-directory layout
    // flat-listed here would read 0 files while plan() reports full bytes
    // — a silent break of the measured == planned invariant (review r15)
    val files = BytePlanner.listParquet(new java.io.File(path))
    val t0 = System.nanoTime()
    val reads = files.map { f =>
      val ranges = planRanges(f, columns, predicate)
      FileRead(f, ranges.size, readRanges(f, ranges, blockSize))
    }
    Report(reads, (System.nanoTime() - t0) / 1e9)
  }
}
