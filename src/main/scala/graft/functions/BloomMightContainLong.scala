package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom.mightContainLong(child)` as a codegen'd scan predicate.
  *
  * The scale shape this serves: probing a 100 TB fact side against a
  * bounded key set (eval-set grams, revoked ids, a sampled audience).
  * A broadcast join gets there too, but only after the fact side has
  * been scanned AND shuffled/hashed per row; this predicate kills
  * non-matching rows inside the scan's whole-stage-codegen pass — the
  * same effect `spark.sql.optimizer.runtime.bloomFilter` injects for
  * selective shuffle joins (asserted in ScaleTechniquesSpec), available
  * explicitly when the filter is built once and reused across many
  * queries/sessions rather than re-derived per join.
  *
  * The expression carries the SERIALIZED filter (spark-sketch wire
  * format, version-stable) so the plan ships bytes, not a live object;
  * each executor deserializes once per expression instance
  * (transient lazy), and generated code calls straight into
  * `BloomFilter.mightContainLong` — no boxing, no lambda.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = GraftFunctions.BloomName

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $bloomRef.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // content-based equality: the default case-class equals compares the
  // byte ARRAY by reference, so two probes built from identical
  // serialized filters would never be semanticEquals — defeating
  // CacheManager plan matching and common-subexpression elimination
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainLong =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)
}

object BloomMightContainLong {

  /** Build a serialized bloom over a long column of (the distinct rows
    * of) a BOUNDED frame — the small side; never call this on the
    * unbounded side of a probe.
    */
  def serializedBloom(
      df: org.apache.spark.sql.DataFrame,
      column: String,
      fpp: Double = 0.03): Array[Byte] = {
    val n = math.max(df.count(), 1L)
    val bf = df.stat.bloomFilter(column, n, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
