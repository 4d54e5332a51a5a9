package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The full k-wide minhash signature of a space-separated string in ONE
  * pass: for every token, the two 32-bit halves (h1, h2) of its md5, and
  * sig(i) = min over tokens of (h1 + i·h2) mod 2^32 (the
  * Kirsch–Mitzenmacher derived family) — bit-identical to the SQL chain
  * the DuckDB oracle runs (`conv(substring(md5(token), 1|9, 8), 16, 10)`
  * + the same modular arithmetic).
  *
  * Why native: the previous formulation exploded (doc, token) × k seed
  * rows into a partial-MIN aggregation — correct and map-side combined,
  * but it ships docs×k rows through a SHUFFLE to assemble each
  * signature. Here the signature is a per-row projection computed where
  * the document bytes already are: zero shuffle, zero exchange — at
  * 100 TB the banding join becomes the ONLY shuffle in the near-dup
  * path. Token repeats are not deduplicated: duplicates cannot change a
  * minimum, and skipping the distinct pass avoids any per-row set
  * allocation.
  *
  * Reference anchor: see Dedup.scala's banding math (dd2/dd3/dd6).
  */
case class MinhashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = GraftFunctions.MinhashName

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.compute(input.asInstanceOf[UTF8String], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSigs.compute($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {

  private val Mod = 0xffffffffL // (x & Mod) == x mod 2^32 for x >= 0


  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData =
    new GenericArrayData(computeMins(s, k, 1))

  /** The k mins over the string's word `gram`-shingles (gram = 1:
    * tokens; gram = 2: adjacent-pair shingles digested verbatim from the
    * byte buffer, BigramMd5Hashes' trick — `"w_i w_{i+1}"` IS the slice
    * from token i's start to token i+1's end). A gram-2 input with fewer
    * than two tokens has no shingle: the mins stay Long.MaxValue, and
    * callers must pre-filter (a shingle-less doc belongs in no band).
    */
  private[functions] def computeMins(s: UTF8String, k: Int, gram: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    val digest = Md5Local.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var start = 0
    var prevStart = -1 // previous token's start; -1 until one token seen
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') { // token is bytes[start, i)
        val from = if (gram == 1) start else prevStart
        if (from >= 0) { // shingle is bytes[from, i)
          digest.reset()
          digest.update(bytes, from, i - from)
          val d = digest.digest()
          val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
            ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
          var seed = 0
          var h = h1 // (h1 + seed*h2) built incrementally, masked to 32 bits
          while (seed < k) {
            if (h < mins(seed)) mins(seed) = h
            h = (h + h2) & Mod
            seed += 1
          }
        }
        prevStart = start
        start = i + 1
      }
      i += 1
    }
    mins
  }

  /** Fused minhash → LSH banding: the numHashes/bandSize banding table's
    * band-signature longs computed straight from the text, skipping the
    * k-long signature array materialization AND the interpreted
    * slice → cast(array<string>) → concat_ws → md5 → conv chain the
    * column-level banding ran per band. Each band signature is the top
    * 60 bits of md5 over the ","-joined decimal minhash values —
    * bit-identical to the SQL chain (`conv(substr(md5(string_agg(...)),
    * 1, 15), 16, 10)` = the first 15 hex chars = bigEndian64 >>> 4).
    */
  def computeBandSigs(
      s: UTF8String, numHashes: Int, bandSize: Int, gram: Int): GenericArrayData = {
    val mins = computeMins(s, numHashes, gram)
    val numBands = numHashes / bandSize
    val digest = Md5Local.get()
    val out = new Array[Long](numBands)
    val buf = new java.lang.StringBuilder(bandSize * 11)
    var b = 0
    while (b < numBands) {
      buf.setLength(0)
      var r = 0
      while (r < bandSize) {
        if (r > 0) buf.append(',')
        buf.append(mins(b * bandSize + r))
        r += 1
      }
      digest.reset()
      // decimal digits + ',' are single-byte in UTF-8/ISO-8859-1 alike
      digest.update(buf.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val d = digest.digest()
      var v = 0L
      var j = 0
      while (j < 8) { v = (v << 8) | (d(j) & 0xffL); j += 1 }
      out(b) = v >>> 4 // first 15 hex chars = top 60 bits
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** Fused minhash → banding projection: `array<long>` of the
  * numHashes/bandSize LSH band signatures of a document, computed in one
  * native pass (see [[MinhashSigs.computeBandSigs]]). `gram` = 1 bands
  * word shingles (dd3/dd6/cp1), 2 bands adjacent-pair shingles (dd7's
  * order-sensitive candidates). Zero exchange: banding becomes
  * posexplode of this per-row value, and the banding self-join stays the
  * only shuffle in the near-dup path.
  */
case class MinhashBandSigs(child: Expression, numHashes: Int, bandSize: Int, gram: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = GraftFunctions.BandSigsName

  override def nullSafeEval(input: Any): Any =
    MinhashSigs.computeBandSigs(input.asInstanceOf[UTF8String], numHashes, bandSize, gram)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashSigs.computeBandSigs($c, $numHashes, $bandSize, $gram);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
