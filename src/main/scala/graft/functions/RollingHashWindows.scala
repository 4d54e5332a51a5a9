package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash over every k-byte window of a string:
  * h(w_i) = Σ_j c_{i+j}·B^(k-1-j) mod M, computed INCREMENTALLY —
  * h_{i+1} = ((h_i − c_i·B^(k-1))·B + c_{i+k}) mod M — so the whole
  * window array is O(n) per row instead of O(n·k). The SQL-expressible
  * per-window polynomial form measured 25× slower at sf0.1 (interpreted
  * substring+ascii per window byte); this is the expression-over-UDF
  * preference applied to a genuinely sequential algorithm.
  *
  * Returns array<long> of window hashes (empty when the string is
  * shorter than k). Byte-oriented: equals the character polynomial for
  * ASCII inputs, which is what the corpus and the DuckDB oracle use.
  */
case class RollingHashWindows(child: Expression, k: Int, b: Long, m: Long)
    extends UnaryExpression {

  // Hot-loop bounds: `(byte & 0xff) * bPow` reaches 255·(m-1) and
  // `h * b + byte` reaches (m-1)·b + 255 — require both to fit in a long
  // so any future parameterization fails fast instead of silently
  // corrupting hashes (the old `m * b > 0` check passed e.g. m≈2^61, b=2).
  require(
    k > 0 && b > 0 && m > 1 &&
      m <= Long.MaxValue / 256 && b <= (Long.MaxValue - 255) / m,
    "parameters must fit in long math: need m <= 2^63/256 and b <= (2^63-255)/m")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = GraftFunctions.RollingHashName

  /** B^(k-1) mod M, plan-time constant. */
  private lazy val bPow: Long = {
    var p = 1L
    (1 until k).foreach(_ => p = p * b % m)
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) new GenericArrayData(Array.empty[Long])
    else {
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = (h * b + (bytes(i) & 0xff)) % m; i += 1 }
      out(0) = h
      i = k
      while (i < n) {
        h = (((h - (bytes(i - k) & 0xff) * bPow) % m + m) % m * b + (bytes(i) & 0xff)) % m
        out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |if ($n < $k) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $k + 1];
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) { $h = ($h * ${b}L + ($bytes[$i] & 0xff)) % ${m}L; }
         |  $out[0] = $h;
         |  for (int $i = $k; $i < $n; $i++) {
         |    $h = ((($h - ($bytes[$i - $k] & 0xff) * ${bPow}L) % ${m}L + ${m}L) % ${m}L * ${b}L
         |          + ($bytes[$i] & 0xff)) % ${m}L;
         |    $out[$i - $k + 1] = $h;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
