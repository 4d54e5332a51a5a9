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

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, k: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val digest = md5.get()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') { // token is bytes[start, i)
        digest.reset()
        digest.update(bytes, start, i - start)
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
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
