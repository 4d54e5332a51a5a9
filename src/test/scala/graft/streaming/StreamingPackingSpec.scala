package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Incremental packing must equal one-shot packing when shards arrive in
  * order: two batches through the offset state produce byte-identical
  * span tables to a single batch over the union, and earlier spans are
  * never rewritten (append-only).
  */
class StreamingPackingSpec extends SparkSpec {

  import spark.implicits._

  private def doc(id: Long, source: String, nTokens: Int) =
    (id, source, Seq.fill(nTokens)("w").mkString(" "))

  private val batch1 = Seq(
    doc(0, "a", 300), doc(1, "a", 400), doc(2, "b", 100), doc(3, "b", 700))
  private val batch2 = Seq(
    doc(10, "a", 500), doc(11, "a", 60), doc(12, "b", 900))

  private def df(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "source", "text")

  test("two incremental batches equal one-shot packing of the union") {
    val root = Files.createTempDirectory("stream-pack").toString
    val (st1, sp1) = (s"$root/inc-state", s"$root/inc-spans")
    StreamingPacking.packBatch(spark, df(batch1), st1, sp1)
    val firstBatchSpans = spark.read.parquet(sp1).collect().toSet
    StreamingPacking.packBatch(spark, df(batch2), st1, sp1)

    val (st2, sp2) = (s"$root/one-state", s"$root/one-spans")
    StreamingPacking.packBatch(spark, df(batch1 ++ batch2), st2, sp2)

    val incremental = spark.read.parquet(sp1).collect().toSet
    val oneShot = spark.read.parquet(sp2).collect().toSet
    assert(incremental === oneShot)
    // append-only: batch-1 spans survive unchanged
    assert(firstBatchSpans.subsetOf(incremental))
  }

  test("streaming wrapper packs file drops exactly once, offsets carried") {
    val root = Files.createTempDirectory("stream-pack-wrap").toString
    val (landing, state, spans, chk) =
      (s"$root/landing", s"$root/state", s"$root/spans", s"$root/chk")
    Files.createDirectories(java.nio.file.Paths.get(landing))

    def drop(rows: Seq[(Long, String, String)], name: String): Unit =
      df(rows).coalesce(1).write.mode("overwrite").parquet(s"$landing/$name")

    val schema = df(batch1).schema
    drop(batch1, "f1")
    StreamingPacking.packStream(spark, s"$landing/*", schema, state, spans, chk)
      .awaitTermination()
    drop(batch2, "f2")
    StreamingPacking.packStream(spark, s"$landing/*", schema, state, spans, chk)
      .awaitTermination()

    // the wrapper must equal two explicit incremental batches
    val (st2, sp2) = (s"$root/ref-state", s"$root/ref-spans")
    StreamingPacking.packBatch(spark, df(batch1), st2, sp2)
    StreamingPacking.packBatch(spark, df(batch2), st2, sp2)
    assert(spark.read.parquet(spans).collect().toSet
      === spark.read.parquet(sp2).collect().toSet)
  }

  test("offsets continue across batches: no sequence overlap or gap per shard") {
    val root = Files.createTempDirectory("stream-pack2").toString
    val (st, sp) = (s"$root/state", s"$root/spans")
    StreamingPacking.packBatch(spark, df(batch1), st, sp)
    StreamingPacking.packBatch(spark, df(batch2), st, sp)
    val spans = spark.read.parquet(sp)
    // per shard: every sequence 0..max-1 is filled to exactly the budget
    val perSeq = spans.groupBy("source", "seq_id").agg(sum("span_len").as("fill"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last"))
    val bad = perSeq.join(lastSeq, Seq("source"))
      .filter(col("seq_id") =!= col("last") && col("fill") =!= 512L)
    assert(bad.count() === 0L)
    // token conservation: span lengths sum to the corpus token count
    val total = spans.agg(sum("span_len")).head().getLong(0)
    assert(total === (batch1 ++ batch2).map(_._3.split(" ").length.toLong).sum)
  }
}
