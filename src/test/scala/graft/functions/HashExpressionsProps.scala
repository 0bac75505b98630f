package graft.functions

import graft.functions.expressions.HashExpressions
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the native hash kernels: the rolling n-gram update
  * (h' = (h - s[i]·31^(n-1))·31 + s[i+n] mod P) must agree with the naive
  * per-window polyHash on every input, and the fused distinct-count must
  * equal the materialized array's length.
  */
object HashExpressionsProps extends Properties("HashExpressions") {

  // include chars above the ASCII range to stress the modular drop term
  private val genText: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString), // tiny alphabet: collisions
    Gen.listOf(Gen.choose(1.toChar, 0x2fff.toChar)).map(_.mkString))

  private val genN: Gen[Int] = Gen.choose(1, 16)

  private def naive(s: String, n: Int): Seq[Long] = {
    if (s.length < n) Seq.empty
    else (0 to s.length - n).map(i => HashExpressions.polyHash(s, i, i + n))
      .distinct.sorted
  }

  property("rolling n-gram hashes == naive windowed polyHash (distinct-sorted)") =
    Prop.forAll(genText, genN) { (s, n) =>
      val rolled = HashExpressions
        .evalCharNgramHashes(UTF8String.fromString(s), n).toLongArray().toSeq
      rolled == naive(s, n)
    }

  property("window hashes: positional, length |th|-n+1, distinct-set == shingle hashes") =
    Prop.forAll(Gen.listOf(Gen.choose(0L, 1000000006L)), genN) { (th, n) =>
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      val arr = new GenericArrayData(th.toArray)
      val win = HashExpressions.evalWindowHashes(arr, n).toLongArray().toSeq
      val naiveWin =
        if (th.length < n) Seq.empty[Long]
        else th.sliding(n).map(w =>
          w.tail.foldLeft(w.head)((acc, h) => (acc * 31 + h) % 1000000007L)).toSeq
      val shingles = HashExpressions.evalShingleHashes(arr, n).toLongArray().toSeq
      win == naiveWin && win.distinct.sorted == shingles
    }

  property("fused distinct count == materialized array length") =
    Prop.forAll(genText, genN) { (s, n) =>
      HashExpressions.evalCharNgramDistinctCount(UTF8String.fromString(s), n) ==
        HashExpressions.evalCharNgramHashes(UTF8String.fromString(s), n).numElements()
    }
}
