package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Misra–Gries heavy-hitters sketch over a long column: at most `m`
  * (item, estimate) counters. Guarantees (classic MG, and the merge rule
  * of Agarwal et al. 2013, "Mergeable Summaries"): estimates UNDERCOUNT
  * by at most N/(m+1) total weight, so every item with true frequency
  * > N/(m+1) is present in the summary — the candidate-superset
  * property that lets a second, candidate-filtered exact pass turn the
  * sketch into an EXACT heavy-hitters answer while shuffling only
  * O(m) distinct keys instead of the whole vocabulary.
  *
  * Mergeable: map-side partial sketches combine by adding counters and,
  * when over capacity, subtracting the (m+1)-th largest count from all
  * and dropping non-positive ones — error adds linearly, staying within
  * N/(m+1) for the union. Buffer is a bounded hash map; serialization is
  * the flat (size, item*, count*) byte image.
  *
  * Output: array<struct<item, est>> sorted by item (deterministic given
  * a deterministic input partitioning is NOT required for the
  * candidate-superset property, which is what downstream consumes).
  */
case class MisraGriesLongs(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.LongType)

  require(m > 0, "m must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = GraftFunctions.MisraGriesName

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty[Long, Long]

  /** Drop `cut` weight from every counter, removing exhausted ones. */
  private def spend(buffer: mutable.HashMap[Long, Long], cut: Long): Unit =
    buffer.filterInPlace((_, c) => c > cut).mapValuesInPlace((_, c) => c - cut)

  override def update(
      buffer: mutable.HashMap[Long, Long], input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[Long]
      buffer.get(item) match {
        case Some(c) => buffer.update(item, c + 1)
        case None if buffer.size < m => buffer.update(item, 1L)
        case None => spend(buffer, 1L) // the classic decrement-all step
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[Long, Long],
      b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (item, c) =>
      b1.update(item, b1.getOrElse(item, 0L) + c)
    }
    if (b1.size > m) {
      // subtract the (m+1)-th largest count; ≤ m survivors remain
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      spend(b1, counts(counts.length - m - 1))
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[Long, Long]): Any =
    new GenericArrayData(
      buffer.toArray.sortBy(_._1).map { case (item, est) =>
        new GenericInternalRow(Array[Any](item, est))
      })

  override def serialize(buffer: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (item, c) => out.writeLong(item); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[Long, Long]
    (0 until n).foreach(_ => buf.update(in.getLong, in.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
