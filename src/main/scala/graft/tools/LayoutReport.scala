package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import scala.jdk.CollectionConverters._

/** Layout inspector: per column of a parquet file/dir, everything the
  * pruning ladder depends on — row-group count and sizes, page counts
  * (OffsetIndex), ColumnIndex presence, bloom-filter presence, encodings,
  * and whether row-group min/max ranges are disjoint (the sortedness
  * signal that makes range pruning effective). One JSON line per column.
  *
  * `runMain graft.tools.LayoutReport <path>`
  */
object LayoutReport {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01/lineitem.parquet"
    val files = {
      val f = new java.io.File(path)
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      else Array(f.getPath)
    }
    files.foreach { file =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(file), new Configuration()))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val cols = blocks.head.getColumns.asScala.map(_.getPath.toDotString)
        cols.foreach { c =>
          var pages = 0
          var hasColumnIndex = true
          var hasBloom = true
          var chunkBytes = 0L
          val mins = Seq.newBuilder[Comparable[Any]]
          val maxs = Seq.newBuilder[Comparable[Any]]
          var encodings = Set.empty[String]
          blocks.foreach { b =>
            val chunk = b.getColumns.asScala.find(_.getPath.toDotString == c).get
            chunkBytes += chunk.getTotalSize
            encodings ++= chunk.getEncodings.asScala.map(_.toString)
            val oi = Option(reader.readOffsetIndex(chunk))
            pages += oi.map(_.getPageCount).getOrElse(1)
            if (reader.readColumnIndex(chunk) == null) hasColumnIndex = false
            if (reader.getBloomFilterDataReader(b).readBloomFilter(chunk) == null)
              hasBloom = false
            val s = chunk.getStatistics
            if (s != null && s.hasNonNullValue) {
              mins += s.genericGetMin.asInstanceOf[Comparable[Any]]
              maxs += s.genericGetMax.asInstanceOf[Comparable[Any]]
            }
          }
          // sortedness signal: group [min, max] intervals non-overlapping
          // in file order ⇒ a range predicate prunes proportionally
          val mi = mins.result()
          val mx = maxs.result()
          val disjoint = mi.size == blocks.size &&
            (1 until mi.size).forall(i => mx(i - 1).compareTo(mi(i).asInstanceOf[Any]) <= 0)
          println(
            s"""{"file":"${new java.io.File(file).getName}","column":"$c",""" +
              s""""row_groups":${blocks.size},"pages":$pages,"bytes":$chunkBytes,""" +
              s""""column_index":$hasColumnIndex,"bloom":$hasBloom,""" +
              s""""disjoint_group_ranges":$disjoint,""" +
              s""""encodings":${encodings.toSeq.sorted.mkString("[\"", "\",\"", "\"]")}}""")
        }
      } finally reader.close()
    }
  }
}
