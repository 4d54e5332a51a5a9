package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bottom-k sketch aggregate: keeps the k smallest DISTINCT long values
  * seen — the classic mergeable KMV (k-minimum-values) sketch. Over
  * uniformly hashed inputs, distinct-count ≈ (k-1)·M / h_(k) where h_(k)
  * is the k-th smallest hash and M the hash range; if fewer than k
  * distinct values exist the sketch IS the exact distinct set.
  *
  * A `TypedImperativeAggregate`: the buffer is a bounded sorted set that
  * updates per row, merges across partitions (partial aggregation
  * map-side, like any built-in agg), and serializes to a BOUNDED
  * (4 + 8·size ≤ 4 + 8·k byte) image Spark ships between stages — the
  * image grows with fill level up to k, it is not constant-size.
  * Deterministic output (sorted
  * array), so the DuckDB oracle can recompute it bit-for-bit with
  * `list_sort(list_distinct(list(h)))[1:k]`.
  */
case class BottomKLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.TreeSet[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = GraftFunctions.BottomKName

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def add(buffer: mutable.TreeSet[Long], v: Long): Unit =
    if (buffer.size < k) buffer += v
    else if (v < buffer.last && !buffer.contains(v)) {
      buffer -= buffer.last
      buffer += v
    }

  override def update(buffer: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: mutable.TreeSet[Long], b2: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b2.foreach(add(b1, _))
    b1
  }

  override def eval(buffer: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buffer.toArray)

  override def serialize(buffer: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += in.getLong)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
