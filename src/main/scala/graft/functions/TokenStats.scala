package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `struct(n_tokens, n_stop)` of a space-separated string in ONE byte
  * pass: token count under `split(text, ' ')` semantics (limit -1 —
  * empty and trailing tokens count) and how many tokens are in the
  * given stopword set.
  *
  * Why native: the composable form —
  * `size(split(text,' '))` + `size(filter(split(text,' '), t -> t IN (...)))`
  * — materializes the token array TWICE and runs the membership lambda
  * interpreted per token. This is the per-row scan predicate of the
  * corpus pipeline's quality gate (and tx2's score), i.e. the code that
  * touches EVERY byte of a 100 TB corpus; here it is one pass over the
  * original buffer with no array, no per-token UTF8String, no lambda
  * dispatch, inside whole-stage codegen. Stopword compare is length-
  * gated byte equality against plan-time constants.
  *
  * Reference anchor: extends the reference's row-level validation rules
  * (src/data_validation.py) to corpus-scale text quality predicates.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = GraftFunctions.TokenStatsName

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String], stopBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {

  /** Static entry point shared by eval and generated code. */
  def compute(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens = 0
    var nStop = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') { // token is bytes[start, i)
        nTokens += 1
        val len = i - start
        var k = 0
        var matched = false
        while (k < stops.length && !matched) {
          val sb = stops(k)
          if (sb.length == len) {
            var j = 0
            while (j < len && bytes(start + j) == sb(j)) j += 1
            matched = j == len
          }
          k += 1
        }
        if (matched) nStop += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](nTokens, nStop))
  }
}
