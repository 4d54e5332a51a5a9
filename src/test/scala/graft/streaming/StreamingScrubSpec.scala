package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Cross-batch semantics of the incremental substring scrub: a later
  * arrival sharing an 8-gram with an earlier one is scrubbed; the
  * earlier copy — already emitted — stays intact (prefix consistency);
  * batch-internal duplicates count immediately; and a replayed batch
  * (foreachBatch is at-least-once) sees exactly the pre-batch state
  * instead of double-counting its own grams.
  */
class StreamingScrubSpec extends SparkSpec {

  import spark.implicits._

  private val eight = "a b c d e f g h" // one exact 8-gram
  private def state() =
    Files.createTempDirectory("graft_scrub_spec").resolve("state").toString

  test("later batch scrubbed against earlier grams; earlier copy untouched") {
    val st = state()
    val b1 = Seq((1L, s"x $eight y")).toDF("doc_id", "text")
    val out1 = StreamingScrub.scrubBatch(spark, b1, st, 0L)
      .as[(Long, Int, Long, String)].collect().toSeq
    assert(out1 === Seq((1L, 10, 0L, s"x $eight y")), "unique at ingest: untouched")

    val b2 = Seq((2L, s"p q $eight r")).toDF("doc_id", "text")
    val out2 = StreamingScrub.scrubBatch(spark, b2, st, 1L)
      .as[(Long, Int, Long, String)].collect().toSeq
    assert(out2 === Seq((2L, 11, 8L, "p q r")),
      "the span covered by the now-duplicated gram is removed")
  }

  test("batch-internal duplicates count without any prior state") {
    val st = state()
    val b = Seq(
      (1L, s"$eight tail1"),
      (2L, s"$eight tail2")).toDF("doc_id", "text")
    val out = StreamingScrub.scrubBatch(spark, b, st, 0L)
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq((1L, 9, 8L, "tail1"), (2L, 9, 8L, "tail2")))
  }

  test("state accumulates: a third occurrence is scrubbed too") {
    val st = state()
    StreamingScrub.scrubBatch(spark, Seq((1L, s"$eight one")).toDF("doc_id", "text"), st, 0L)
    StreamingScrub.scrubBatch(spark, Seq((2L, s"$eight two")).toDF("doc_id", "text"), st, 1L)
    val out3 = StreamingScrub.scrubBatch(
      spark, Seq((3L, s"$eight three")).toDF("doc_id", "text"), st, 2L)
      .as[(Long, Int, Long, String)].collect().toSeq
    assert(out3 === Seq((3L, 9, 8L, "three")))
  }

  test("replaying a batch id is idempotent: no self-scrub, no double count") {
    val st = state()
    val b1 = Seq((1L, s"x $eight y")).toDF("doc_id", "text")
    val first = StreamingScrub.scrubBatch(spark, b1, st, 0L)
      .as[(Long, Int, Long, String)].collect().toSeq
    // crash-after-state-write, replay: same batchId runs again
    val replay = StreamingScrub.scrubBatch(spark, b1, st, 0L)
      .as[(Long, Int, Long, String)].collect().toSeq
    assert(replay === first,
      "a replayed batch must not be scrubbed against its own gram counts")
    assert(replay === Seq((1L, 10, 0L, s"x $eight y")))
    // state holds the batch's counts exactly once
    val n = spark.read.parquet(st)
      .filter($"gram".isNotNull).groupBy("gram").count()
      .filter($"count" > 1).count()
    assert(n === 0L, "replay must overwrite, not append, its state partition")
  }

  test("short documents (< 8 tokens) pass through unscathed") {
    val st = state()
    val b = Seq((1L, "just five tokens here now"), (2L, "")).toDF("doc_id", "text")
    val out = StreamingScrub.scrubBatch(spark, b, st, 0L)
      .as[(Long, Int, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 5, 0L, "just five tokens here now"),
      (2L, 1, 0L, "")))
  }
}
