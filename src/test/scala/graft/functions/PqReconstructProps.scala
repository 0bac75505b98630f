package graft.functions

import graft.functions.expressions.HashExpressions
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Property tests for the PQ encode+reconstruct kernel against a naive
  * reference: same argmin tie-break (first strict minimum, codebook
  * order), same double accumulation order, NULL on every malformed shape
  * (vector length not a multiple of nsub; codebook row of the wrong
  * length) — the guards review r13/r14 added must agree with the spec'd
  * contract on EVERY input, not just the handful in PqReconstructSpec.
  */
object PqReconstructProps extends Properties("PqReconstruct") {

  private def naive(
      cv: Array[Float], cbs: Seq[Array[Float]], nsub: Int): Option[Array[Float]] = {
    val dim = cv.length
    if (cbs.isEmpty) return Some(Array.empty[Float])
    val sub = dim / nsub
    if (sub * nsub != dim) return None
    if (cbs.exists(_.length != dim)) return None
    val out = new Array[Float](dim)
    var b = 0
    while (b < nsub) {
      val off = b * sub
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cbs.length) {
        var d = 0.0
        var k = 0
        while (k < sub) {
          val diff = cv(off + k).toDouble - cbs(c)(off + k).toDouble
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      var k = 0
      while (k < sub) { out(off + k) = cbs(best)(off + k); k += 1 }
      b += 1
    }
    Some(out)
  }

  private def call(cv: Array[Float], cbs: Seq[Array[Float]], nsub: Int): Option[Seq[Float]] =
    Option(HashExpressions.evalPqReconstruct(
      new GenericArrayData(cv),
      new GenericArrayData(cbs.map(r => new GenericArrayData(r): ArrayData).toArray),
      nsub)).map(_.toFloatArray().toSeq)

  private val genShape: Gen[(Int, Int)] = for {
    nsub <- Gen.choose(1, 4)
    sub <- Gen.choose(1, 4)
  } yield (nsub, sub)

  property("well-formed == naive reference (incl. ties)") =
    Prop.forAll(genShape, Gen.choose(1, 5), Gen.long) { case ((nsub, sub), ncb, seed) =>
      val rnd = new scala.util.Random(seed)
      // small 0.5-step floats so exact distance ties occur and the
      // first-strict-minimum tie-break path actually runs
      def vec(dim: Int) = Array.fill(dim)((rnd.nextInt(9) - 4) * 0.5f)
      val dim = nsub * sub
      val cv = vec(dim)
      val cbs = Seq.fill(ncb)(vec(dim))
      call(cv, cbs, nsub) == naive(cv, cbs, nsub).map(_.toSeq)
    }

  property("malformed vector length -> NULL") =
    Prop.forAll(genShape, Gen.choose(1, 3), Gen.long) { case ((nsub, sub), ncb, seed) =>
      (nsub > 1) ==> {
        val rnd = new scala.util.Random(seed)
        val dim = nsub * sub + 1 // never a multiple of nsub > 1... only if nsub divides 1
        val cv = Array.fill(dim)(rnd.nextFloat())
        val cbs = Seq.fill(ncb)(Array.fill(dim)(rnd.nextFloat()))
        (dim % nsub != 0) ==> (call(cv, cbs, nsub).isEmpty)
      }
    }

  property("short/long codebook row -> NULL; empty codebook -> empty") =
    Prop.forAll(genShape, Gen.choose(0, 2), Gen.long) { case ((nsub, sub), delta, seed) =>
      val rnd = new scala.util.Random(seed)
      val dim = nsub * sub
      val cv = Array.fill(dim)(rnd.nextFloat())
      val bad = Seq(Array.fill(dim)(rnd.nextFloat()),
        Array.fill(math.max(0, dim + (if (delta == 0) -1 else delta)))(rnd.nextFloat()))
      call(cv, Seq.empty, nsub).contains(Seq.empty[Float]) &&
        call(cv, bad, nsub).isEmpty
    }
}
