package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed MinHash sketch aggregator: folds the per-document shingle-hash
  * sets of a GROUP (a source, a shard, a day) into one k-permutation
  * signature — the group-level analog of [[expressions.MinHashSig]], and
  * the Spark `Aggregator[IN, BUF, OUT]` counterpart of the reference's
  * `Aggregator` trait (/root/reference/v1/src/main.rs:1246-1250).
  *
  * The buffer is elementwise-min over permuted hashes, so `reduce` and
  * `merge` are the same associative/commutative operation — partial
  * aggregation and any merge order give identical results, which is what
  * makes the sketch usable as a map-side-combined aggregate at 100 TB:
  * each group's signature is k longs, regardless of corpus size.
  * Signature coordinate i: min over all shingles s of
  * ((1 + i*2654435761) % P * s + (7 + i*40503)) % P — same permutations
  * as the per-document path, so the oracle replays it.
  */
class MinHashSketch(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val P = TextFunctions.Prime

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      val a = (1L + i * 2654435761L) % P
      val b = (7L + i * 40503L) % P
      var j = 0
      while (j < shingles.length) {
        val h = (a * shingles(j) + b) % P
        if (h < buf(i)) buf(i) = h
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x
  }

  /** NULL when the group contributed no shingles at all (hashes are < P,
    * so Long.MaxValue can only mean "never updated") — matching SQL's
    * MIN-over-empty.
    */
  override def finish(buf: Array[Long]): Array[Long] =
    if (k > 0 && buf(0) == Long.MaxValue) null else buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashSketch {
  /** Aggregate column over an `array<bigint>` shingle-set column. */
  def sketch(shingles: Column, k: Int = 16): Column =
    udaf(new MinHashSketch(k), ExpressionEncoder[Array[Long]]()).apply(shingles)

  /** Estimated Jaccard between two equal-k signatures: the fraction of
    * agreeing coordinates (the standard MinHash estimator).
    */
  def estimatedJaccard(a: Column, b: Column, k: Int = 16): Column = {
    import org.apache.spark.sql.functions._
    size(filter(zip_with(a, b, (x, y) => x === y), v => v)).cast("double") / k
  }
}
