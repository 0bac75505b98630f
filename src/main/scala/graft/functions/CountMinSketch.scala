package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch as a typed Aggregator: a d×w counter matrix folded
  * over pre-hashed keys — the mergeable heavy-hitter estimator. Like
  * [[MinHashSketch]], `reduce` and `merge` commute (elementwise adds), so
  * partial aggregation in any order gives identical buffers: one d·w-long
  * array per partition crosses the shuffle, regardless of row count or key
  * cardinality — the sketch that replaces a full groupBy(key) when only
  * frequent-key estimates are needed at 100 TB.
  *
  * Row i uses the MinHash permutation constants (a_i·h + b_i) mod P mod w,
  * so the DuckDB oracle replays cells exactly. Estimates are the classic
  * min over rows: an overestimate with error ≤ 2N/w at confidence
  * 1 - (1/2)^d (Cormode & Muthukrishnan 2005).
  */
class CountMinSketch(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  private val P = TextFunctions.Prime

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], keyHash: Long): Array[Long] = {
    var i = 0
    while (i < d) {
      val a = (1L + i * 2654435761L) % P
      val b = (7L + i * 40503L) % P
      // floorMod twice: a full-range key hash (xxhash64 instead of the
      // [0, P) poly-hash the current call sites use) would make the signed
      // % negative here while estimate() uses pmod — an
      // ArrayIndexOutOfBounds crash at best, reads from cells that were
      // never incremented at worst. floorMod is identical on [0, P) keys.
      val y = java.lang.Math.floorMod(keyHash, P)
      buf(i * w + java.lang.Math.floorMod(
        java.lang.Math.floorMod(a * y + b, P), w.toLong).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  private val P = TextFunctions.Prime

  /** Aggregate column folding a `bigint` key-hash column into the sketch. */
  def sketch(keyHash: Column, d: Int = 4, w: Int = 256): Column =
    udaf(new CountMinSketch(d, w), ExpressionEncoder[Long]()).apply(keyHash)

  /** Point estimate for one key: min over the d cells the key hashes to.
    * Pure column arithmetic (statically unrolled over d) — usable after
    * broadcasting the 1-row sketch against any key set.
    */
  def estimate(sketch: Column, keyHash: Column, d: Int = 4, w: Int = 256): Column = {
    // normalize the key into [0, P) first, exactly like reduce(): a
    // full-range hash would overflow a*keyHash in Long and (worse) index
    // different cells than the sketch side incremented
    val y = pmod(keyHash, lit(P))
    val cells = (0 until d).map { i =>
      val a = (1L + i * 2654435761L) % P
      val b = (7L + i * 40503L) % P
      element_at(sketch,
        (lit(i * w) + pmod(pmod(lit(a) * y + lit(b), lit(P)), lit(w))).cast("int") + lit(1))
    }
    least(cells: _*)
  }
}
