package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.graft.ParquetReadBridge
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class PqBridgeProbeSpec extends SparkSpec {
  test("probe: row reader, row-index column, columnar reader") {
    import spark.implicits._
    val dir = graft.TempDirs.create("pqprobe").resolve("t").toString
    (1L to 100L).map(k => (k, s"v$k")).toDF("k", "v")
      .coalesce(1).write.parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val pf = ParquetReadBridge.partitionedFile(
      st.getPath.toString, st.getLen, st.getModificationTime)

    // row mode with row-index appended
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), ParquetReadBridge.RowIndexField))
    val cls = ParquetReadBridge.reader(spark, schema, Seq.empty,
      returningBatch = false)
    val rows = cls(pf).map(r => (r.getLong(0), r.getLong(2))).toList
    assert(rows.size == 100)
    assert(rows.head == ((1L, 0L)))
    assert(rows.last == ((100L, 99L)))

    // row mode with a pushed filter: positions stay TRUE file positions
    val cls2 = ParquetReadBridge.reader(spark, schema,
      Seq(org.apache.spark.sql.sources.GreaterThan("k", 90L)),
      returningBatch = false)
    val rows2 = cls2(pf).map(r => (r.getLong(0), r.getLong(2))).toList
    assert(rows2.forall { case (k, pos) => pos == k - 1 })

    // columnar mode
    val plain = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    if (ParquetReadBridge.supportBatch(spark, plain)) {
      val cls3 = ParquetReadBridge.reader(spark, plain, Seq.empty,
        returningBatch = true)
      val batches = cls3(pf)
        .asInstanceOf[Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]]
      assert(batches.map(_.numRows()).sum == 100)
    } else fail("vectorized not supported for plain schema?")

    // empty schema => count-only rows
    val cls4 = ParquetReadBridge.reader(spark, new StructType(), Seq.empty,
      returningBatch = false)
    assert(cls4(pf).size == 100)
  }
}
