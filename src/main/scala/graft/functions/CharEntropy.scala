package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (log2, per code point) of a string in one pass —
  * the compression-proxy text-quality signal: repetitive/boilerplate
  * documents (low entropy) and binary-ish noise (high entropy) both
  * sit far from natural prose, so corpus filters cut on both tails.
  * Deflate-ratio is the classic form; character entropy is its
  * engine-reproducible stand-in (DuckDB's `entropy()` aggregate is the
  * oracle) measuring the same repetition signal without a codec.
  *
  * Why native: the composable form — explode per character, groupBy,
  * aggregate — turns every document into |chars| rows and a shuffle.
  * This expression is a per-row scan projection: ASCII counts in a
  * flat 128-slot array (the hot path — the corpus is ASCII), other
  * code points in a spill map, then entropy = log2(n) - Σc·log2(c)/n.
  * No shuffle, no explode, inside whole-stage codegen.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = GraftFunctions.CharEntropyName

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  private val Log2 = math.log(2.0)

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val cell = other.computeIfAbsent(cp, _ => new Array[Int](1))
        cell(0) += 1
      }
      i += Character.charCount(cp)
    }
    // H = log2(n) - (1/n) * sum(c * log2(c))
    var acc = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) acc += c * (math.log(c) / Log2)
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        acc += c * (math.log(c) / Log2)
      }
    }
    math.log(n) / Log2 - acc / n
  }
}
