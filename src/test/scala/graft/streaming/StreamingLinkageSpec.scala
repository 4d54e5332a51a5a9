package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Pair semantics of the incremental linkage: cross-batch pairs emit
  * when the later doc arrives, batch-internal pairs immediately, every
  * unordered pair exactly once — the invariant that makes the drained
  * stream equal the batch operator. Plus replay idempotency: a re-run
  * batch id (foreachBatch is at-least-once) must not join against its
  * own projections and emit self-pairs.
  */
class StreamingLinkageSpec extends SparkSpec {

  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta"
  private def state() =
    Files.createTempDirectory("graft_link_spec").resolve("state").toString

  test("cross-batch pair emits once, on the later arrival") {
    val st = state()
    val out1 = StreamingLinkage.linkBatch(
      spark, Seq((1L, base)).toDF("doc_id", "text"), st, 0L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out1.isEmpty, "a lone document matches nothing")

    val out2 = StreamingLinkage.linkBatch(
      spark, Seq((2L, base + " eta")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out2.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(out2.head._3 >= 0.9)
  }

  test("batch-internal pairs emit immediately and are not re-emitted later") {
    val st = state()
    val out1 = StreamingLinkage.linkBatch(
      spark, Seq((1L, base), (2L, base + " eta")).toDF("doc_id", "text"), st, 0L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out1.map(p => (p._1, p._2)) === Seq((1L, 2L)))

    // a third, unrelated doc in the same block must pair only forward
    val out2 = StreamingLinkage.linkBatch(
      spark, Seq((3L, base + " theta iota")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(out2.map(p => (p._1, p._2)) === Seq((1L, 3L), (2L, 3L)),
      "the (1,2) pair must not re-emit")
  }

  test("different blocks never pair regardless of similarity") {
    val st = state()
    StreamingLinkage.linkBatch(spark, Seq((1L, "alpha x y z")).toDF("doc_id", "text"), st, 0L)
    val out = StreamingLinkage.linkBatch(
      spark, Seq((2L, "beta x y z")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out.isEmpty)
  }

  test("replaying a batch id is idempotent: no self-pairs, no duplicates") {
    val st = state()
    StreamingLinkage.linkBatch(spark, Seq((1L, base)).toDF("doc_id", "text"), st, 0L)
    val first = StreamingLinkage.linkBatch(
      spark, Seq((2L, base + " eta")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    // crash-after-state-write, replay of batch 1
    val replay = StreamingLinkage.linkBatch(
      spark, Seq((2L, base + " eta")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(replay === first,
      "replayed batch must see pre-batch state only — no (2,2) self-pair")
    assert(replay.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    // state holds doc 2's projection exactly once
    val n = spark.read.parquet(st).filter($"doc_id" === 2L).count()
    assert(n === 1L, "replay must overwrite, not append, its state partition")
  }
}
