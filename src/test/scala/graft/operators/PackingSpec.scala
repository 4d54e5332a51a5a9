package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Sequence packing invariants on the real corpus: spans tile every
  * document exactly, every non-trailing sequence is filled to the
  * budget, offsets stay inside the budget, and the efficiency summary
  * agrees with the packing table it summarizes.
  */
class PackingSpec extends SparkSpec {

  private val B = 512L
  private lazy val pack =
    graft.SparkEntry.queries("pk1_sequence_pack")(spark, TestSpark.Sf0001)
      .cache()

  test("spans tile each document: per-doc span_len sums to its token count") {
    val docs = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val tiled = pack.groupBy("doc_id").agg(sum("span_len").as("packed"))
      .join(docs, Seq("doc_id"))
      .filter(col("packed") =!= col("n"))
    assert(tiled.count() === 0L)
  }

  test("every sequence except the shard-trailing one is filled to the budget") {
    val perSeq = pack.groupBy("source", "seq_id").agg(sum("span_len").as("fill"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last"))
    val short = perSeq.join(lastSeq, Seq("source"))
      .filter(col("seq_id") =!= col("last") && col("fill") =!= B)
    assert(short.count() === 0L)
    // trailing sequences are partial or full, never overfull
    val over = perSeq.filter(col("fill") > B)
    assert(over.count() === 0L)
  }

  test("offsets are consistent: seq_start + span_len <= budget, doc_start >= 0") {
    assert(pack.filter(col("seq_start") + col("span_len") > B).count() === 0L)
    assert(pack.filter(col("doc_start") < 0 || col("seq_start") < 0 ||
      col("span_len") <= 0).count() === 0L)
  }

  test("pk2 summary agrees with the pk1 table") {
    val fromPack = pack.groupBy("source").agg(
      countDistinct("seq_id").as("seqs"),
      sum("span_len").as("tokens"))
    val pk2 = graft.SparkEntry.queries("pk2_packing_efficiency")(spark, TestSpark.Sf0001)
    val mismatch = pk2.join(fromPack, Seq("source"))
      .filter(col("n_sequences") =!= col("seqs") ||
        col("total_tokens") =!= col("tokens") ||
        col("pad_waste") =!= col("n_sequences") * B - col("total_tokens"))
    assert(mismatch.count() === 0L)
  }
}
