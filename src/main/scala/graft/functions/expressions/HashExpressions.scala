package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hashing hot path.
  *
  * The same arithmetic exists as SQL higher-order functions
  * ([[graft.functions.TextFunctions]]) — but Spark evaluates HOF lambdas
  * interpreted (one Expression-tree walk per element), and CollapseProject
  * can re-inline an expensive array-producing projection into every
  * `element_at` that references it from inside a lambda (lambda references
  * are collected as a *set*, so the producer looks "referenced once"). On a
  * 5000-doc fixture that turned an O(chars) n-gram hash into O(chars²) and a
  * 48 s query into a hang. These expressions do one tight JVM loop per row
  * instead: same values, none of the interpretive machinery.
  *
  * Every expression implements `doGenCode` (round-2 verdict: the earlier
  * `CodegenFallback` versions broke whole-stage codegen spans at each call
  * site and opted out of subexpression elimination, which is how one
  * SimHash query ended up tokenizing the corpus 4×). The generated code is
  * a single static call into the `eval*` helpers below — the loop itself
  * gains nothing from Janino, but staying inside the span removes the
  * fallback seam's boxing and lets CSE dedupe repeated calls.
  *
  * All hashes are base-31 rolling hashes over character codepoints mod
  * 1e9+7, identical to the DuckDB oracle fragments
  * (`list_reduce(list_prepend(0,...), (acc,ch) -> (acc*31+ch) % 1000000007)`).
  */
object HashExpressions {
  final val Prime = 1000000007L

  /** Fully-qualified name the generated Java uses for static calls. */
  final val H = "graft.functions.expressions.HashExpressions"

  /** Rolling base-31 hash of s[from, until) — from/until are UTF-16
    * indices, but the SUMMED UNITS ARE UNICODE CODE POINTS: Spark's
    * `split('') + ascii` leg and DuckDB's `string_split('') + ascii`
    * oracle fragment both yield code points (verified: 'a😀b' →
    * [97, 128512, 98] in BOTH engines), so hashing UTF-16 units here
    * would silently diverge on any non-BMP character (review r13 —
    * the surrogate pair 55357/56832 vs the code point 128512). BMP
    * text is unchanged: one code unit == one code point there.
    */
  @inline def polyHash(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Prime
      i += Character.charCount(cp)
    }
    acc
  }

  /** Unicode code points of s — the iteration unit shared with the HOF
    * and oracle legs; the windowed kernels index this, not raw chars.
    */
  @inline def codePoints(s: String): Array[Int] = {
    val out = new Array[Int](s.length)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    if (k == s.length) out else java.util.Arrays.copyOf(out, k)
  }

  /** Distinct + ascending sort (order is never observable downstream — only
    * set ops and mins consume these arrays — and sortedness lets
    * [[IntersectSize]] run a primitive merge walk instead of a boxed
    * hash set per pair).
    */
  def distinct(xs: Array[Long], n: Int): Array[Long] = {
    java.util.Arrays.sort(xs, 0, n)
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      if (k == 0 || xs(i) != out(k - 1)) { out(k) = xs(i); k += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(out, k)
  }

  val longArray: DataType = ArrayType(LongType, containsNull = false)

  // ---- static entry points shared by interpreted eval and generated code
  // (plain signatures only: Janino resolves these through the object's
  // static forwarders on the HashExpressions class)

  def evalPolyHash(s: UTF8String): Long = {
    val str = s.toString
    polyHash(str, 0, str.length)
  }

  /** All m = len-n+1 window hashes (undeduplicated) over the CODE POINT
    * sequence (n-gram = n code points, matching the HOF/oracle legs), by
    * rolling update: h' = (h - cp[i]·31^(n-1))·31 + cp[i+n], all mod P —
    * O(len) instead of O(n·len); identical values to the windowed
    * polyHash. Bounds: h < P ≈ 2^30, code point < 2^21, drop term
    * < 2^21·P < 2^51, normalized difference < P, ×31 + cp < 2^35 — no
    * i64 overflow.
    */
  private def ngramHashesRaw(s: String, n: Int): Array[Long] = {
    val cps = codePoints(s)
    val len = cps.length
    if (len < n) return Array.empty[Long]
    val m = len - n + 1
    val hashes = new Array[Long](m)
    var pow = 1L // 31^(n-1) mod P
    var j = 1
    while (j < n) { pow = pow * 31 % Prime; j += 1 }
    var h = 0L
    j = 0
    while (j < n) { h = (h * 31 + cps(j)) % Prime; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < m) {
      h = (((h - cps(i - 1) * pow % Prime + Prime) % Prime) * 31 +
        cps(i + n - 1)) % Prime
      hashes(i) = h
      i += 1
    }
    hashes
  }

  def evalCharNgramHashes(input: UTF8String, n: Int): ArrayData = {
    val hashes = ngramHashesRaw(input.toString, n)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Long])
    new GenericArrayData(distinct(hashes, hashes.length))
  }

  /** Count of distinct n-gram hashes without materializing the output
    * array — the fusion target of [[graft.plans.GraftRewrites]] for
    * `size(graft_char_ngram_hashes(s, n))`.
    */
  def evalCharNgramDistinctCount(input: UTF8String, n: Int): Int = {
    val hashes = ngramHashesRaw(input.toString, n)
    if (hashes.isEmpty) return 0
    java.util.Arrays.sort(hashes)
    var k = 1
    var i = 1
    while (i < hashes.length) {
      if (hashes(i) != hashes(i - 1)) k += 1
      i += 1
    }
    k
  }

  def evalTokenHashes(input: UTF8String): ArrayData = {
    val s = input.toString
    val out = Array.newBuilder[Long]
    var start = 0
    var i = 0
    val len = s.length
    while (i <= len) {
      if (i == len || s.charAt(i) == ' ') {
        out += polyHash(s, start, i)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** One combined hash per position over the pre-hashed token array —
    * the single fold both the shingle (deduplicated) and window
    * (positional) forms share; empty when fewer than n tokens.
    */
  private def windowHashesRaw(th: Array[Long], n: Int): Array[Long] = {
    if (th.length < n) return Array.empty[Long]
    val m = th.length - n + 1
    val hashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      var acc = th(i)
      var j = 1
      while (j < n) { acc = (acc * 31 + th(i + j)) % Prime; j += 1 }
      hashes(i) = acc
      i += 1
    }
    hashes
  }

  def evalShingleHashes(input: ArrayData, n: Int): ArrayData = {
    val hashes = windowHashesRaw(input.toLongArray(), n)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Long])
    new GenericArrayData(distinct(hashes, hashes.length))
  }

  /** [[evalShingleHashes]] WITHOUT the distinct: one hash per POSITION, so
    * window i's hash sits at index i — the positional form winnowing /
    * span-coverage selection windows need (they index into it).
    */
  def evalWindowHashes(input: ArrayData, n: Int): ArrayData =
    new GenericArrayData(windowHashesRaw(input.toLongArray(), n))

  /** null (NOT an empty array) on an empty shingle set — caller handles. */
  def evalMinHashSig(input: ArrayData, k: Int): ArrayData = {
    val sh = input.toLongArray()
    if (sh.isEmpty) return null
    val sig = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = (1L + i * 2654435761L) % Prime
      val b = (7L + i * 40503L) % Prime
      var min = Long.MaxValue
      var j = 0
      while (j < sh.length) {
        val h = (a * sh(j) + b) % Prime
        if (h < min) min = h
        j += 1
      }
      sig(i) = min
      i += 1
    }
    new GenericArrayData(sig)
  }

  def evalIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    var i = 0; var j = 0; var n = 0
    while (i < xs.length && j < ys.length) {
      val c = java.lang.Long.compare(xs(i), ys(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  private def toDoubles(d: ArrayData, isFloat: Boolean): Array[Double] =
    if (isFloat) {
      val f = d.toFloatArray()
      val out = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { out(i) = f(i).toDouble; i += 1 }
      out
    } else d.toDoubleArray()

  /** Caller guarantees equal lengths (the expressions null out mismatches). */
  def evalDot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val xs = toDoubles(a, aFloat)
    val ys = toDoubles(b, bFloat)
    var acc = 0.0
    var i = 0
    while (i < xs.length) { acc += xs(i) * ys(i); i += 1 }
    acc
  }

  /** ±1 plane-weight sign matrix, memoized per (planes, dim): the weight
    * formula is pure in (j, i), and recomputing it per ROW costs more
    * multiply-mods than the dot products themselves (56×64 per vector).
    * Values: sign(j, i) = true ⇒ +v(i).
    *
    * (j*K + i + 1) * A wraps mod P ~10^7 times so parities mix; the
    * round-1 form (j*A + i*B) % P never wrapped for i < 64, making
    * parity = parity(base_j) XOR parity(i) — every plane was the SAME
    * alternating ±1 hyperplane up to global sign, so buckets degenerated
    * to {pattern, ~pattern} (half the corpus each).
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Boolean]]]()

  private def planeSigns(planes: Int, dim: Int): Array[Array[Boolean]] =
    signCache.computeIfAbsent((planes, dim), { case (p, d) =>
      Array.tabulate(p, d)((j, i) => ((j * 100003L + i + 1) * 2654435761L) % Prime % 2 == 0)
    })

  def evalHyperplaneBucket(input: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val v = toDoubles(input, isFloat)
    val signs = planeSigns(planes, v.length)
    var bucket = 0L
    var j = 0
    while (j < planes) {
      val row = signs(j)
      var s = 0.0
      var i = 0
      while (i < v.length) {
        s += (if (row(i)) v(i) else -v(i))
        i += 1
      }
      if (s > 0) bucket |= (1L << j)
      j += 1
    }
    bucket
  }

  def evalSimHash(input: ArrayData, bits: Int): Long = {
    val th = input.toLongArray()
    var out = 0L
    var b = 0
    while (b < bits) {
      val a = (1L + b * 2654435761L) % Prime
      val c = (7L + b * 40503L) % Prime
      var s = 0L
      var i = 0
      while (i < th.length) {
        s += (if ((a * th(i) + c) % Prime % 2 == 1L) 1L else -1L)
        i += 1
      }
      if (s >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Fingerprints of the non-overlapping `n`-token chunks of `input` (the
    * floor(ntok/n) COMPLETE chunks, single-space tokenization with empties
    * preserved). Because `split(' ')` → `concat_ws(' ')` round-trips
    * exactly, chunk c's joined string IS the contiguous substring of the
    * input from the start of token c·n to the end of token c·n+n−1 — so
    * each fingerprint is one polyHash over that span, never a rebuilt
    * string. Values identical to
    * `polyhash(concat_ws(' ', slice(split(text,' '), c*n+1, n)))`.
    */
  def evalChunkHashes(input: UTF8String, n: Int): ArrayData = {
    val s = input.toString
    val len = s.length
    var ntok = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') ntok += 1; i += 1 }
    val m = ntok / n
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](ntok)
    starts(0) = 0
    var k = 1
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { starts(k) = i + 1; k += 1 }
      i += 1
    }
    val out = new Array[Long](m)
    var c = 0
    while (c < m) {
      val from = starts(c * n)
      val until = if (c * n + n < ntok) starts(c * n + n) - 1 else len
      out(c) = polyHash(s, from, until)
      c += 1
    }
    new GenericArrayData(out)
  }

  /** PQ encode+reconstruct in one pass: for each of `nsub` contiguous
    * subspaces pick the codeword (first strict minimum of sub-squared-L2,
    * so the caller's cb_id-sorted codebook breaks ties toward the smallest
    * id) and emit its sub-slice. Distances accumulate in double, ascending
    * dimension — bit-identical to the HOF fold and the DuckDB oracle.
    */
  def evalPqReconstruct(cv: ArrayData, cbs: ArrayData, nsub: Int): ArrayData = {
    val dim = cv.numElements()
    val sub = dim / nsub
    val ncb = cbs.numElements()
    // empty codebook → empty reconstruction (the HOF fold this replaces
    // flattened nsub empty init slices), never an index crash
    if (ncb == 0) return new GenericArrayData(Array.empty[Float])
    // a vector whose length is not a multiple of nsub is a malformed row,
    // not a config: NULL (poison-row drop contract), never a silently
    // zero-filled tail (review r13)
    if (sub * nsub != dim) return null
    // a NULL codebook row, or one shorter than the vector (which would
    // read past its end on UnsafeArrayData — silent garbage), is the same
    // poison contract → NULL, never an NPE/OOB that kills the stage
    var v = 0
    while (v < ncb) {
      if (cbs.isNullAt(v) || cbs.getArray(v).numElements() != dim) return null
      v += 1
    }
    val out = new Array[Float](dim)
    var b = 0
    while (b < nsub) {
      val off = b * sub
      // seed on codeword 0, not -1/∞: a NaN anywhere (poison vector or
      // codebook entry) makes every `d < bestD` false, and an unseeded
      // best would index getArray(-1) and kill the scan task on one bad
      // row (review r13) — seeded, an all-NaN subspace deterministically
      // reconstructs from the lowest cb_id, the same tie-break direction
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < ncb) {
        val cb = cbs.getArray(c)
        var d = 0.0
        var k = 0
        while (k < sub) {
          val diff = cv.getFloat(off + k).toDouble - cb.getFloat(off + k).toDouble
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      val win = cbs.getArray(best)
      var k = 0
      while (k < sub) { out(off + k) = win.getFloat(off + k); k += 1 }
      b += 1
    }
    new GenericArrayData(out)
  }

  private[expressions] def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(s"unsupported array element type $t")
    }
}

import HashExpressions._

/** `graft_poly_hash(str)` — rolling hash of the whole string (fingerprint). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    evalPolyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalPolyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `graft_char_ngram_hashes(str, n)` — distinct rolling hashes of every
  * length-`n` character window (== poly hash of each substring).
  */
case class CharNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = longArray
  override def nullSafeEval(input: Any): Any =
    evalCharNgramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalCharNgramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramHashes =
    copy(child = newChild)
}

/** `size(graft_char_ngram_hashes(s, n))` fused: the distinct count without
  * materializing the array (no GenericArrayData, no copy). Produced by the
  * [[graft.plans.GraftRewrites]] optimizer rule, never parsed directly.
  */
case class CharNgramDistinctCount(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    evalCharNgramDistinctCount(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalCharNgramDistinctCount($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramDistinctCount =
    copy(child = newChild)
}

/** `graft_token_hashes(str)` — rolling hash of every single-space-separated
  * token, empties preserved (same tokenization as `split(str, ' ')`).
  */
case class TokenHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = longArray
  override def nullSafeEval(input: Any): Any =
    evalTokenHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalTokenHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** `graft_shingle_hashes(tokenHashes, n)` — distinct hashes of every
  * n-token window, combining pre-hashed tokens:
  * ((h1*31 + h2) % P * 31 + h3) % P.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = longArray
  override def nullSafeEval(input: Any): Any =
    evalShingleHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_window_hashes(tokenHashes, n)` — POSITIONAL hashes of every
  * n-token window (no distinct; index i = window starting at token i).
  * Same fold as [[ShingleHashes]], kept separate so selection windows
  * (winnowing, span coverage) can address windows by position.
  */
case class WindowHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = longArray
  override def nullSafeEval(input: Any): Any =
    evalWindowHashes(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalWindowHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** `graft_minhash_sig(shingleHashes, k)` — k-permutation MinHash signature,
  * permutation i: ((1 + i*2654435761) % P * s + (7 + i*40503)) % P. NULL on
  * an empty shingle set (mirrors `array_min(empty) = NULL` in the HOF form,
  * so LSH band joins drop such rows in both engines).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // NULL on empty input even when the child is non-null
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    evalMinHashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $H.evalMinHashSig($c, $k);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `graft_intersect_size(a, b)` — |a ∩ b| for two sorted-distinct i64
  * arrays (as produced by [[CharNgramHashes]]/[[ShingleHashes]]): a merge
  * walk over primitive longs, no boxing, no per-call hash set.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    evalIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$H.evalIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectSize =
    copy(left = l, right = r)
}

/** Dot product of two float/double array columns, accumulated
  * left-to-right in double — bit-identical to
  * `aggregate(zip_with(a, b, (p,q) -> double(p)*double(q)), 0d, +)` and to
  * the oracle's `list_reduce(list_prepend(0.0, ...), +)`, without the
  * per-element interpreted-lambda overhead (the embedding pair queries
  * evaluate this 10⁵–10⁷ times).
  */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  // NULL on mismatched lengths, matching the HOF formulation (zip_with pads
  // with NULL → the aggregate goes NULL): a malformed embedding must surface
  // as NULL, not a silently truncated score.
  override def nullable: Boolean = true
  private lazy val lf = isFloatArray(left)
  private lazy val rf = isFloatArray(right)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    if (xs.numElements() != ys.numElements()) null
    else evalDot(xs, ys, lf, rf)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $H.evalDot($a, $b, $lf, $rf);
      }
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `graft_chunk_hashes(str, n)` — fingerprints of the non-overlapping
  * n-token chunks (see [[HashExpressions.evalChunkHashes]]): one polyHash
  * per complete chunk over the original string's span, replacing the
  * interpreted rebuild-the-chunk-string-then-fold HOF in x96/x100/x103.
  */
case class ChunkHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = longArray
  override def nullSafeEval(input: Any): Any =
    evalChunkHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalChunkHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
}

/** PQ encode+reconstruct (see [[HashExpressions.evalPqReconstruct]]):
  * left = the vector (array<float>), right = the cb_id-sorted codebook
  * vectors (array<array<float>>), `nsub` contiguous subspaces. Returns the
  * reconstruction the asymmetric-distance scan scores. Not registered —
  * constructed directly by x127 via `GraftFunctions.column`.
  */
case class PqReconstruct(left: Expression, right: Expression, nsub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(nsub >= 1)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  // NULL on a malformed row (vector length not a multiple of nsub, or a
  // codebook row of the wrong length) — the poison-drop contract. The
  // codegen must propagate it explicitly, like MinHashSig/DotProduct.
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any =
    evalPqReconstruct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], nsub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $H.evalPqReconstruct($a, $b, $nsub);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqReconstruct =
    copy(left = l, right = r)
}

/** `graft_hyperplane_bucket(vec, planes)` — random-hyperplane LSH bucket:
  * bit j is the sign of ⟨v, h_j⟩ with deterministic ±1 plane weights
  * derived from (((j*100003 + i + 1) * 2654435761) mod P) mod 2. Accumulates in
  * double, ascending i — bit-identical to the HOF formulation and the
  * DuckDB oracle.
  */
case class HyperplaneBucket(child: Expression, planes: Int) extends UnaryExpression {
  require(planes >= 1 && planes <= 63)
  override def dataType: DataType = LongType
  private lazy val isFloat = isFloatArray(child)
  override def nullSafeEval(input: Any): Any =
    evalHyperplaneBucket(input.asInstanceOf[ArrayData], planes, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalHyperplaneBucket($c, $planes, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** `graft_simhash(tokenHashes, bits)` — `bits`-wide SimHash (default 64,
  * the standard width for corpus-scale near-dup): output bit b is set iff
  * the ±1 vote over all token hashes sums ≥ 0, where token h votes +1 on
  * bit b iff ((a_b * h + c_b) mod P) mod 2 == 1 with
  * a_b = (1 + b*2654435761) mod P, c_b = (7 + b*40503) mod P — the same
  * fixed permutation family as [[MinHashSig]], so every output bit is an
  * independent hash of the token (the token hashes themselves carry only
  * ~30 bits, so using bit b of the raw hash would leave bits ≥ 30
  * constant and collapse the banding space). Replayable in the oracle:
  * a_b, h < P ≈ 2^30 so a_b*h + c_b < 2^62 never overflows i64.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 64)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    evalSimHash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$H.evalSimHash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
