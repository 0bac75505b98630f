package graft.metrics

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property evidence for the range-coalescing algebra RangedReader's
  * planned==measured invariant stands on (the v2 `merge_chunks` analog):
  * the merged ranges cover exactly the same bytes, in sorted disjoint
  * maximal form — no gap bytes admitted, no planned bytes lost. Checked
  * directly on the pure function, no I/O.
  */
object RangedReaderProps extends Properties("RangedReader.coalesce") {
  import RangedReader.ByteRange

  private val ranges: Gen[List[ByteRange]] = Gen.listOf(for {
    off <- Gen.chooseNum(0L, 500L)
    len <- Gen.chooseNum(1L, 60L)
  } yield ByteRange(off, len))

  private def covered(rs: Seq[ByteRange]): Set[Long] =
    rs.flatMap(r => r.offset until (r.offset + r.length)).toSet

  property("covers exactly the same byte set") = forAll(ranges) { rs =>
    covered(RangedReader.coalesce(rs)) == covered(rs)
  }

  property("output is sorted, disjoint, and maximal (no two ranges touch)") =
    forAll(ranges) { rs =>
      val out = RangedReader.coalesce(rs)
      out.sliding(2).forall {
        case Seq(a, b) => a.offset + a.length < b.offset // strict gap between
        case _ => true
      }
    }

  property("total length == distinct covered bytes (no double reads)") =
    forAll(ranges) { rs =>
      val out = RangedReader.coalesce(rs)
      out.map(_.length).sum == covered(rs).size.toLong
    }

  property("idempotent") = forAll(ranges) { rs =>
    val once = RangedReader.coalesce(rs)
    RangedReader.coalesce(once) == once
  }
}
