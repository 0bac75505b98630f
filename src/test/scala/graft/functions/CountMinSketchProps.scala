package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property evidence for the CMS guarantees the catalog relies on (x84,
  * x93): estimates never undercount, and the buffer fold is
  * order-insensitive — checked directly on the Aggregator (no Spark
  * session), so the space explored is wide and fast.
  */
object CountMinSketchProps extends Properties("CountMinSketch") {
  private val keys = Gen.listOf(Gen.chooseNum(0L, 1000000006L))

  private def sketchOf(ks: Seq[Long], d: Int, w: Int): Array[Long] = {
    val a = new CountMinSketch(d, w)
    ks.foldLeft(a.zero)(a.reduce)
  }

  private def estimate(buf: Array[Long], k: Long, d: Int, w: Int): Long = {
    val P = TextFunctions.Prime
    (0 until d).map { i =>
      val ai = (1L + i * 2654435761L) % P
      val bi = (7L + i * 40503L) % P
      buf(i * w + (((ai * k + bi) % P) % w).toInt)
    }.min
  }

  property("estimate >= exact count for every key") = forAll(keys) { ks =>
    val buf = sketchOf(ks, d = 4, w = 8) // tiny w forces heavy collisions
    val exact = ks.groupBy(identity).view.mapValues(_.size.toLong)
    exact.forall { case (k, n) => estimate(buf, k, 4, 8) >= n }
  }

  property("split-and-merge equals one fold, any split point") =
    forAll(keys, Gen.chooseNum(0, 100)) { (ks, cut) =>
      val agg = new CountMinSketch(4, 16)
      val (l, r) = ks.splitAt(cut % (ks.length + 1))
      val merged = agg.merge(sketchOf(l, 4, 16), sketchOf(r, 4, 16))
      merged.sameElements(sketchOf(ks, 4, 16))
    }
}
