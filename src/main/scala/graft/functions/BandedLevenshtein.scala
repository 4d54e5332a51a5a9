package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Thresholded Levenshtein distance, result-identical to Spark's
  * `levenshtein(a, b, k)` (distance when ≤ k, -1 beyond), specialized
  * for the candidate-verification hot loop (dd9 runs it once per LSH
  * candidate pair — millions of calls per sweep).
  *
  * Why native: Spark's `UTF8String.levenshteinDistance(other, k)` is
  * general-purpose — per-character code-point decoding and per-call
  * array allocation put it at ~10.8 µs/call on 64-char ASCII inputs
  * (r16 microbench, 1M calls, warm). This kernel adds two exact fast
  * paths and a tight byte-banded DP:
  *
  *   - equality short-circuit: `a.equals(b)` is a memcmp; near-dup
  *     corpora hit it often and skip the DP outright (distance 0);
  *   - pure-ASCII inputs (one high-bit scan over ≤ len bytes) run the
  *     Ukkonen band over raw bytes with two reused-size int rows —
  *     no code-point stepping, no boxing;
  *   - anything non-ASCII delegates to Spark's own implementation, so
  *     parity is by construction there (BandedLevenshteinSpec pins the
  *     ASCII band against Spark's result property-style).
  *
  * The threshold is a literal (the caller's verification bound); both
  * engines' oracles recompute the plain DP and filter, which the
  * thresholded form is result-equal to on the kept rows.
  */
case class BandedLevenshtein(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k >= 0, s"threshold must be >= 0, got $k")

  override def dataType: DataType = IntegerType
  override def prettyName: String = GraftFunctions.LevenshteinKName

  override def nullSafeEval(a: Any, b: Any): Any =
    BandedLevenshtein.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BandedLevenshtein.compute($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BandedLevenshtein {

  /** Static entry point shared by eval and generated code. */
  def compute(a: UTF8String, b: UTF8String, k: Int): Int = {
    if (a.equals(b)) return 0 // memcmp; exact regardless of encoding
    if (!isAscii(a) || !isAscii(b))
      return a.levenshteinDistance(b, k) // Spark's kernel: parity by construction
    // ASCII: chars == bytes, so the DP runs over raw bytes.
    var s = a.getBytes
    var t = b.getBytes
    if (s.length > t.length) { val tmp = s; s = t; t = tmp } // symmetric
    val n = s.length
    val m = t.length
    if (m - n > k) return -1
    if (n == 0) return m // m - 0 <= k here, so the distance is just m
    // shorter side fits one machine word -> Myers' bit-parallel DP:
    // exact distance at ~14 word ops per text byte, vs ~8 ops per CELL
    // over the (2k+1)-wide band below (k=16 -> 33 cells/row). dd9's
    // 64-char prefixes always land here.
    if (n <= 64) return myers(s, t, k)
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      var lo = i - k; if (lo < 1) lo = 1
      var hi = i + k; if (hi > m) hi = m
      // left edge of the band: dp(i)(lo-1) — the real column 0 when the
      // band reaches it, otherwise outside-band = INF
      cur(lo - 1) = if (lo == 1 && i <= k) i else inf
      val si = s(i - 1)
      var rowMin = inf
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (si == t(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return -1 // the whole band exceeded k: no path back
      // sentinel for the next row's prev(j) read at its band's top edge
      if (hi < m) cur(hi + 1) = inf
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    if (prev(m) > k) -1 else prev(m)
  }

  /** Per-thread positions-of-char masks for [[myers]] (byte value ->
    * 64-bit mask over the pattern); only the entries a call touches are
    * re-zeroed on exit, the same reuse discipline as JaroWinkler's.
    */
  private val peqScratch = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = new Array[Long](256)
  }

  /** Myers' bit-parallel Levenshtein (1999) for an ASCII pattern `s` of
    * at most 64 bytes against text `t`: the DP column's vertical deltas
    * live in two words (Pv = +1 positions, Mv = -1 positions) and each
    * text byte advances the whole column in ~14 word ops. The score
    * tracks D[n][j] exactly, so the result is the exact distance —
    * thresholded to -1 beyond k like Spark's kernel. Early exit: the
    * final distance is at least score - (remaining text bytes), since
    * one text byte moves D[n][.] by at most 1.
    *
    * Bits >= n hold phantom pattern positions whose Eq is always 0; all
    * information flow in the recurrence is upward (addition carries and
    * left shifts), so they never corrupt bits < n, and the score is
    * read at bit n-1 only. (BandedLevenshteinSpec pins parity against
    * Spark's kernel across the n = 64 seam property-style.)
    */
  private def myers(s: Array[Byte], t: Array[Byte], k: Int): Int = {
    val n = s.length
    val m = t.length
    val peq = peqScratch.get()
    var i = 0
    while (i < n) { peq(s(i) & 0xff) |= 1L << i; i += 1 }
    val last = 1L << (n - 1)
    var pv = -1L
    var mv = 0L
    var score = n
    var j = 0
    var live = true
    while (live && j < m) {
      val eq = peq(t(j) & 0xff)
      val xv = eq | mv
      val xh = (((eq & pv) + pv) ^ pv) | eq
      var ph = mv | ~(xh | pv)
      val mh = pv & xh
      if ((ph & last) != 0L) score += 1
      else if ((mh & last) != 0L) score -= 1
      ph = (ph << 1) | 1L
      pv = (mh << 1) | ~(xv | ph)
      mv = ph & xv
      if (score - (m - 1 - j) > k) live = false // can't get back under k
      j += 1
    }
    i = 0
    while (i < n) { peq(s(i) & 0xff) = 0L; i += 1 }
    if (!live || score > k) -1 else score
  }

  /** One linear high-bit scan; ≤ 64 bytes for dd9's prefixes. */
  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
