package graft.streaming

import graft.SparkSpec
import graft.operators.Decontamination
import java.nio.file.Files

/** Stream-static contamination flagging: a streamed document sharing any
  * 5-gram with the train index is flagged exactly once; clean and
  * too-short documents pass.
  */
class StreamingDecontaminationSpec extends SparkSpec {

  import spark.implicits._

  private def index(train: Seq[(Long, String)]) =
    Decontamination.gramsOf(train.toDF("doc_id", "text"))
      .select("g").distinct()

  test("batch transform: overlap flags, no-overlap and short docs pass") {
    val idx = index(Seq((1L, "a b c d e f"), (2L, "k l m n o p q")))
    val probe = Seq(
      (10L, "z x a b c d e"), // contains train 5-gram "a b c d e"
      (11L, "p q r s t u"), // 5-grams but none in train
      (12L, "one two"), // shorter than the gram width
      (13L, "l m n o p tail") // contains "l m n o p"
    ).toDF("doc_id", "text")
    val flagged = StreamingDecontamination.contaminatedDocs(probe, idx)
      .collect().map(_.getLong(0)).toSet
    assert(flagged === Set(10L, 13L))
  }

  test("flagStream: file drops are probed exactly once against the static index") {
    val root = Files.createTempDirectory("decontam-stream").toString
    val landing = s"$root/landing"
    Files.createDirectories(java.nio.file.Paths.get(landing))
    val idx = index(Seq((1L, "a b c d e f")))

    def drop(rows: Seq[(Long, String)], name: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/$name")

    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    drop(Seq((20L, "x a b c d e"), (21L, "clean text with no overlap at all")), "f1")
    StreamingDecontamination
      .flagStream(s"$landing/*", schema, idx, s"$root/out", s"$root/chk")
      .awaitTermination()
    // second drop: one new contaminated doc, one replay of doc 20
    drop(Seq((22L, "tail b c d e f"), (20L, "x a b c d e")), "f2")
    StreamingDecontamination
      .flagStream(s"$landing/*", schema, idx, s"$root/out", s"$root/chk")
      .awaitTermination()

    val out = spark.read.parquet(s"$root/out").collect().map(_.getLong(0))
    assert(out.sorted.toSeq === Seq(20L, 22L), "each doc flagged exactly once")
  }
}
