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

  // x87's trigram prefilter contract (advice r13): when `pat` is a
  // substring of `text`, every pattern n-gram hash must appear in the
  // text's n-gram hash set — no false negatives, INCLUDING non-BMP code
  // points, where UTF-16 index windowing used to diverge from the
  // code-point windowing the posting side runs. Both sides here use the
  // one shared kernel, so this pins that they can never drift apart.
  private val genCp: Gen[Int] = Gen.frequency(
    4 -> Gen.choose('a'.toInt, 'e'.toInt),
    1 -> Gen.choose(0x10000, 0x1003F)) // supplementary plane: surrogate pairs
  private val genAstralText: Gen[String] =
    Gen.listOf(genCp).map(_.flatMap(Character.toChars(_).toSeq).mkString)

  property("substring's ngram hashes ⊆ text's (prefilter, incl. non-BMP)") =
    Prop.forAll(genAstralText, Gen.choose(0, 20), Gen.choose(1, 12), Gen.choose(1, 4)) {
      (s, off, len, n) =>
        // carve the substring on CODE POINT boundaries (a UTF-16 slice
        // could split a surrogate pair and not be a real substring)
        val cps = HashExpressions.codePoints(s)
        val from = math.min(off, cps.length)
        val until = math.min(from + len, cps.length)
        val pat = cps.slice(from, until).flatMap(Character.toChars(_).toSeq).mkString
        val patH = HashExpressions
          .evalCharNgramHashes(UTF8String.fromString(pat), n).toLongArray().toSet
        val txtH = HashExpressions
          .evalCharNgramHashes(UTF8String.fromString(s), n).toLongArray().toSet
        patH.subsetOf(txtH)
    }
}
