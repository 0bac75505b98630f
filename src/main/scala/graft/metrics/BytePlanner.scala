package graft.metrics

import graft.functions.Predicates
import graft.functions.Predicates._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.metadata.ColumnChunkMetaData
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

import scala.jdk.CollectionConverters._

/** Metadata-only byte planning — the v2 engine re-expressed
  * (/root/reference/v2/src/main.rs): parse footers (S1/S2), prune row
  * groups against column min/max statistics with the v1 `keep_row_group`
  * interval logic incl. NOT via a carried De Morgan flag
  * (v1/src/main.rs:626-798), then report the byte ranges a scan would have
  * to read (S5): surviving column chunks (projected columns only) plus the
  * footer. Missing statistics or unsupported types keep the group
  * (conservative, exactly like the reference).
  *
  * This is the scan-cost observable Spark's task metrics can't provide
  * reliably on local files, and the direct analog of the reference's
  * "bytes read / selectivity" headline numbers.
  */
object BytePlanner {

  final case class FilePlan(
      path: String,
      fileBytes: Long,
      footerBytes: Long,
      rowGroups: Int,
      survivingGroups: Int,
      plannedBytes: Long)

  final case class Plan(files: Seq[FilePlan]) {
    def totalBytes: Long = files.map(_.fileBytes).sum
    def plannedBytes: Long = files.map(_.plannedBytes).sum
    def rowGroups: Int = files.map(_.rowGroups).sum
    def survivingGroups: Int = files.map(_.survivingGroups).sum
    /** Fraction of the physical bytes a pruned scan must read. */
    def selectivity: Double = if (totalBytes == 0) 0.0 else plannedBytes.toDouble / totalBytes
  }

  /** Plan a scan of `columns` (empty ⇒ all) under the reference-grammar
    * `predicate` over one parquet file or a directory of them.
    */
  def plan(path: String, columns: Seq[String], predicate: Option[String]): Plan = {
    val expr = predicate.map(Predicates.parse)
    val files = listParquet(new java.io.File(path))
    Plan(files.map(planFile(_, columns, expr)))
  }

  private def listParquet(f: java.io.File): Seq[String] =
    if (f.isDirectory)
      f.listFiles().toSeq.filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    else Seq(f.getPath)

  private def planFile(file: String, columns: Seq[String], expr: Option[Expr]): FilePlan = {
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new Path(file), new Configuration()))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val footerBytes = readFooterLength(file) + 8L // footer + length word + magic (S1)
      val surviving = blocks.filter { b =>
        val stats = b.getColumns.asScala.map(c => c.getPath.toDotString -> c).toMap
        expr.forall(e => keepRowGroup(e, stats, not = false))
      }
      val wanted: ColumnChunkMetaData => Boolean =
        if (columns.isEmpty) _ => true
        else c => columns.contains(c.getPath.toDotString)
      val planned = surviving
        .flatMap(_.getColumns.asScala.filter(wanted))
        .map(_.getTotalSize)
        .sum + footerBytes
      FilePlan(file, new java.io.File(file).length(), footerBytes,
        blocks.size, surviving.size, planned)
    } finally reader.close()
  }

  /** Trailer parse, byte-for-byte what the reference does (S1,
    * v1/src/main.rs:340-358): seek EOF−8, 4-byte LE footer length, `PAR1`.
    */
  def readFooterLength(file: String): Long = {
    val raf = new java.io.RandomAccessFile(file, "r")
    try {
      raf.seek(raf.length() - 8)
      val b = new Array[Byte](8)
      raf.readFully(b)
      require(b(4) == 'P' && b(5) == 'A' && b(6) == 'R' && b(7) == '1',
        s"not a parquet file (bad magic): $file")
      (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) | ((b(3) & 0xffL) << 24)
    } finally raf.close()
  }

  /** v1 `keep_row_group` (v1/src/main.rs:626-685): true iff the group *may*
    * contain matching rows. `not` carries negation through AND/OR
    * (De Morgan) exactly like the reference's flag.
    */
  private[metrics] def keepRowGroup(
      e: Expr,
      stats: Map[String, ColumnChunkMetaData],
      not: Boolean): Boolean = e match {
    case And(l, r) =>
      if (not) keepRowGroup(l, stats, not) || keepRowGroup(r, stats, not)
      else keepRowGroup(l, stats, not) && keepRowGroup(r, stats, not)
    case Or(l, r) =>
      if (not) keepRowGroup(l, stats, not) && keepRowGroup(r, stats, not)
      else keepRowGroup(l, stats, not) || keepRowGroup(r, stats, not)
    case Not(x) => keepRowGroup(x, stats, !not)
    case Cond(c, op, v) =>
      stats.get(c) match {
        case None => true // unknown column name here ⇒ conservative
        case Some(meta) => keepCond(meta, if (not) negate(op) else op, v)
      }
  }

  private def negate(op: String): String = op match {
    case "<" => ">="
    case "<=" => ">"
    case ">" => "<="
    case ">=" => "<"
    case "==" => "!="
  }

  /** Interval check against the chunk's min/max. Missing/unusable stats ⇒
    * keep. `!=` keeps unless the stats pin every value to the literal.
    * Covers the reference's full stats lattice: numeric (v1 F5), utf8
    * lexicographic (v1/src/main.rs:803-810), boolean membership (F7),
    * timestamp with logical-unit conversion. Writers may truncate string
    * stats, but parquet truncation keeps them valid bounds, so interval
    * logic stays sound.
    */
  private def keepCond(meta: ColumnChunkMetaData, op: String, v: Value): Boolean = {
    val s = meta.getStatistics
    if (s == null || !s.hasNonNullValue) return true
    val tpe = meta.getPrimitiveType

    def interval(min: Double, max: Double, x: Double): Boolean = {
      if (min.isNaN || max.isNaN) return true // never prune on unusable stats
      op match {
        case "<" => min < x
        case "<=" => min <= x
        case ">" => max > x
        case ">=" => max >= x
        case "==" => min <= x && x <= max
        case "!=" => !(min == x && max == x)
      }
    }

    // Integer stats compare in exact i64 arithmetic (like the reference's
    // typed kernels): doubles round above 2^53, so an epoch-nano stat
    // (~1.7e18) within ~128 units of the threshold would prune wrongly.
    def intervalLong(min: Long, max: Long, x: Long): Boolean = op match {
      case "<" => min < x
      case "<=" => min <= x
      case ">" => max > x
      case ">=" => max >= x
      case "==" => min <= x && x <= max
      case "!=" => !(min == x && max == x)
    }

    (tpe.getPrimitiveTypeName, v) match {
      case (INT32 | INT64, I64(l)) if !isTimestamp(tpe) =>
        (longOf(s.genericGetMin), longOf(s.genericGetMax)) match {
          case (Some(mn), Some(mx)) => intervalLong(mn, mx, l)
          case _ => true
        }
      case (INT32 | INT64, F64(_)) if !isTimestamp(tpe) =>
        interval(num(s.genericGetMin), num(s.genericGetMax), numValue(v))
      case (FLOAT | DOUBLE, I64(_) | F64(_)) =>
        interval(num(s.genericGetMin), num(s.genericGetMax), numValue(v))
      case (INT64, Ts(ms)) =>
        timestampUnitScale(tpe) match {
          case Some(perMilli) =>
            // exact: epoch-millis × 1e6 < 2^63 through year ~2262
            (longOf(s.genericGetMin), longOf(s.genericGetMax)) match {
              case (Some(mn), Some(mx)) => intervalLong(mn, mx, ms * perMilli)
              case _ => true
            }
          case None => true
        }
      case (BINARY, Str(x)) =>
        (s.genericGetMin, s.genericGetMax) match {
          case (mn: Binary, mx: Binary) =>
            val min = mn.toStringUsingUTF8
            val max = mx.toStringUsingUTF8
            op match {
              case "<" => min < x
              case "<=" => min <= x
              case ">" => max > x
              case ">=" => max >= x
              case "==" => min <= x && x <= max
              case "!=" => !(min == x && max == x)
            }
          case _ => true
        }
      case (BOOLEAN, Bool(x)) =>
        (s.genericGetMin, s.genericGetMax) match {
          case (mn: java.lang.Boolean, mx: java.lang.Boolean) =>
            op match {
              case "==" => (mn.booleanValue() == x) || (mx.booleanValue() == x)
              case "!=" => !(mn.booleanValue() == x && mx.booleanValue() == x)
              case _ => true // ranges over booleans: keep (v1 F7)
            }
          case _ => true
        }
      case _ => true
    }
  }

  private def isTimestamp(t: org.apache.parquet.schema.PrimitiveType): Boolean =
    t.getLogicalTypeAnnotation
      .isInstanceOf[org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]

  /** Stored units per millisecond for a timestamp column, None if not one. */
  private def timestampUnitScale(t: org.apache.parquet.schema.PrimitiveType): Option[Long] =
    t.getLogicalTypeAnnotation match {
      case ts: org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        ts.getUnit match {
          case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MILLIS => Some(1L)
          case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.MICROS => Some(1000L)
          case org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit.NANOS => Some(1000000L)
          case _ => None
        }
      case _ => None
    }

  private def numValue(v: Value): Double = v match {
    case I64(l) => l.toDouble
    case F64(d) => d
    case _ => Double.NaN
  }

  private def longOf(a: Any): Option[Long] = a match {
    case i: java.lang.Integer => Some(i.longValue())
    case l: java.lang.Long => Some(l.longValue())
    case _ => None
  }

  private def num(a: Any): Double = a match {
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long => l.toDouble
    case f: java.lang.Float => f.toDouble
    case d: java.lang.Double => d
    case _ => Double.NaN
  }
}
