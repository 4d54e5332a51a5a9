package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Prefix-consistency and replay-idempotency of the incremental
  * unigram scorer: a document's score reflects the model at ITS ingest
  * time (later arrivals don't re-score it), batch-internal tokens
  * count immediately, and a replayed batch id sees exactly the
  * pre-batch model.
  */
class StreamingScoringSpec extends SparkSpec {

  import spark.implicits._

  private def state() =
    Files.createTempDirectory("graft_score_spec").resolve("state").toString

  test("single-token batch scores ln(1) = 0 under its own model") {
    val st = state()
    val out = StreamingScoring.scoreBatch(
      spark, Seq((1L, "a a a")).toDF("doc_id", "text"), st, 0L)
      .as[(Long, Long, Double)].collect().toSeq
    // model = {a: 3}, P(a) = 1, ln 1 = 0
    assert(out === Seq((1L, 3L, 0.0)))
  }

  test("later batch scores under the accumulated model") {
    val st = state()
    StreamingScoring.scoreBatch(
      spark, Seq((1L, "a a a")).toDF("doc_id", "text"), st, 0L)
    val out2 = StreamingScoring.scoreBatch(
      spark, Seq((2L, "a b")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    // model now {a: 4, b: 1}, total 5: mean of ln(4/5), ln(1/5),
    // each rounded to 1e-6 before the integer mean
    val lp = (v: Double) => math.round(math.log(v) * 1e6)
    val expected = BigDecimal((lp(4.0 / 5) + lp(1.0 / 5)) / 1e6 / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out2.map(_._1) === Seq(2L))
    assert(out2.head._2 === 2L)
    assert(math.abs(out2.head._3 - expected) < 1e-9)
  }

  test("replaying a batch id is idempotent: no double-counted tokens") {
    val st = state()
    StreamingScoring.scoreBatch(
      spark, Seq((1L, "x y")).toDF("doc_id", "text"), st, 0L)
    val first = StreamingScoring.scoreBatch(
      spark, Seq((2L, "x")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    // crash-after-state-write, replay of batch 1: the model must be
    // {x:1, y:1} + this batch's x — NOT with x counted twice
    val replay = StreamingScoring.scoreBatch(
      spark, Seq((2L, "x")).toDF("doc_id", "text"), st, 1L)
      .as[(Long, Long, Double)].collect().toSeq
    assert(replay === first)
    val n = spark.read.parquet(st)
      .groupBy("tok", "batch").count().filter($"count" > 1).count()
    assert(n === 0L, "replay must overwrite, not append, its state partition")
  }
}
