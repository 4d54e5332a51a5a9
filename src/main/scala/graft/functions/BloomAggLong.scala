package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-building aggregate over long inputs: the write-side twin
  * of [[BloomMightContainLong]] (which is the read-side probe). Returns
  * the spark-sketch serialized filter (version-stable wire format), so
  * the result can be stored as table metadata — per-file blooms in a
  * snapshot log's manifests, Iceberg/Parquet-style — and probed later
  * without the producer JVM.
  *
  * A `TypedImperativeAggregate` like [[BottomKLongs]]: the buffer is the
  * live `BloomFilter`, updated per row map-side, OR-merged across
  * partitions (bloom union is exact for membership), and serialized to
  * its wire image between stages. Distributive and commutative, so
  * partial aggregation applies — building per-file blooms for a 100 TB
  * write is one map-side pass over data the writer just produced.
  *
  * Sizing is the caller's contract: `expectedItems` at the target
  * per-group cardinality and the fpp needed for the planned skip rate.
  * Overfull filters degrade to higher fpp (more false positives, never
  * false negatives), so correctness of bloom-pruned reads is unaffected.
  */
case class BloomAggLong(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  override def inputTypes = Seq(org.apache.spark.sql.types.LongType)

  require(expectedItems > 0, "expectedItems must be positive")
  require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = GraftFunctions.BloomAggName

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter = {
    b1.mergeInPlace(b2)
    b1
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
