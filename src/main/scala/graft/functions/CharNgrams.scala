package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string, in order — equivalent to the SQL
  * chain `transform(sequence(1, length(s)-n+1), i -> substr(s, i, n))`
  * but one pass over the bytes: character start offsets are walked once
  * (a UTF-8 continuation byte never starts a character), then every
  * gram is a zero-copy byte-range slice. The higher-order-function form
  * runs interpreted AND re-walks the string from the start for every
  * `substr` call (O(len²) per row); this is O(len) + one small array.
  *
  * Character (not byte) semantics match Spark's `substr` and DuckDB's
  * `substr`, so the oracle chain stays valid on multi-byte text.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, "n must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = GraftFunctions.CharNgramsName

  override def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String], n)

  // one static call per row (janino-friendly, like BigramMd5Hashes)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNgrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNgrams {

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // char start offsets (plus the end sentinel)
    var chars = 0
    var i = 0
    while (i < len) { if ((bytes(i) & 0xc0) != 0x80) chars += 1; i += 1 }
    val cnt = chars - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val starts = new Array[Int](chars + 1)
    var c = 0
    i = 0
    while (i < len) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(chars) = len
    val out = new Array[AnyRef](cnt)
    i = 0
    while (i < cnt) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
