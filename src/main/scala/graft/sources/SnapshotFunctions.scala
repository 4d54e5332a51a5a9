package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructType}

/** The snapshot catalog's V2 FUNCTION for its `bucket(n, col)` layout
  * transform — what Spark's storage-partitioned-join machinery loads
  * (via the catalog's FunctionCatalog door) to decide that two scans
  * reporting `KeyGroupedPartitioning(bucket(n, col))` are partitioned
  * COMPATIBLY: equality is the bound function's `canonicalName`, so it
  * encodes the column type (murmur3 of an int and of a long differ on
  * the same value — tables keyed on different physical types must NOT
  * co-join without a shuffle).
  *
  * The evaluation is the exact expression the writer routes and stamps
  * with (`pmod(hash(col), n)` — [[graft.operators.SnapshotLog]]'s
  * bucketExpr, Spark Murmur3 seed 42, nulls hashing to the seed), so a
  * partition value computed here can never disagree with a band read
  * off a manifest.
  */
object SnapshotBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, col): pmod(murmur3_hash(col), n) — the snapshot-log " +
      "hidden-partitioning bucket transform"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, col); got ${inputType.catalogString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count; got " +
        inputType.fields(0).dataType.catalogString)
    new SnapshotBucketBound(inputType.fields(1).dataType)
  }
}

private[sources] final class SnapshotBucketBound(colType: DataType)
    extends ScalarFunction[java.lang.Long] {

  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)

  override def resultType(): DataType = LongType

  override def isResultNullable: Boolean = false

  override def name(): String = "bucket"

  override def canonicalName(): String =
    s"graft.snapshot.bucket[${colType.catalogString}]"

  // the column value sits at ordinal 1 of the (n, col) input row;
  // Murmur3Hash(seed 42) over it is exactly the writer's hash(col)
  @transient private lazy val hasher =
    new Murmur3Hash(Seq(BoundReference(1, colType, nullable = true)))

  override def produceResult(input: InternalRow): java.lang.Long = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Int]
    java.lang.Long.valueOf(((h % n) + n) % n)
  }
}
