package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The docstore connector's MicroBatchStream tier: per-file admission
  * control (maxFilesPerTrigger), Trigger.AvailableNow draining a
  * landing directory as a real multi-batch run, and the checkpoint
  * offset as a resume cursor — a restarted query picks up exactly the
  * files that appeared since, no re-reads, no skips.
  */
class DocStoreStreamSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("user_id", StringType), StructField("username", StringType)))

  private def doc(i: Int) = s"""{"user_id": "u$i", "username": "name$i"}"""

  private def writeFile(dir: String, name: String, ids: Range): Unit =
    Files.write(Paths.get(s"$dir/$name"),
      (ids.map(doc).mkString("\n") + "\n").getBytes("UTF-8"))

  private def drain(landing: String, out: String, ckpt: String,
      opts: Map[String, String]): Long = {
    val reader = spark.readStream.format("docstore").schema(schema)
    opts.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(landing)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0)
  }

  test("AvailableNow + maxFilesPerTrigger=1 drains a landing dir file-per-batch") {
    val root = graft.TempDirs.create("docstore_stream").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    writeFile(landing, "part-0.jsonl", 0 until 5)
    writeFile(landing, "part-1.jsonl", 5 until 9)
    writeFile(landing, "part-2.jsonl", 9 until 12)

    val batches = drain(landing, s"$root/out", s"$root/ckpt",
      Map("planMode" -> "cursor", "pageSize" -> "2", "maxFilesPerTrigger" -> "1"))
    assert(batches === 3, "one admitted file per micro-batch")
    val got = spark.read.parquet(s"$root/out")
      .collect().map(_.getString(0)).sorted
    assert(got === (0 until 12).map(i => s"u$i").sorted.toArray)
  }

  test("the checkpoint offset is a resume cursor: restart reads only new files") {
    val root = graft.TempDirs.create("docstore_resume").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    writeFile(landing, "a.jsonl", 0 until 4)
    writeFile(landing, "b.jsonl", 4 until 7)
    drain(landing, s"$root/out", s"$root/ckpt", Map("splitSize" -> "64"))
    assert(spark.read.parquet(s"$root/out").count() === 7)

    // new files land — including one sorting BEFORE the consumed ones,
    // which a naive high-watermark cursor would skip
    writeFile(landing, "0-early.jsonl", 100 until 103)
    writeFile(landing, "c.jsonl", 7 until 10)
    drain(landing, s"$root/out", s"$root/ckpt", Map("splitSize" -> "64"))
    val got = spark.read.parquet(s"$root/out")
      .collect().map(_.getString(0)).sorted
    val expected = ((0 until 10) ++ (100 until 103)).map(i => s"u$i").sorted
    assert(got === expected.toArray, "resume must add exactly the new files once")
  }

  test("split and cursor streaming agree, and pruning reaches the stream reader") {
    val root = graft.TempDirs.create("docstore_stream_modes").toString
    val landing = s"$root/landing"; Files.createDirectories(Paths.get(landing))
    writeFile(landing, "x.jsonl", 0 until 9)

    drain(landing, s"$root/o1", s"$root/c1", Map("splitSize" -> "48"))
    drain(landing, s"$root/o2", s"$root/c2",
      Map("planMode" -> "cursor", "pageSize" -> "4"))
    val a = spark.read.parquet(s"$root/o1").collect().map(_.toString).sorted
    val b = spark.read.parquet(s"$root/o2").collect().map(_.toString).sorted
    assert(a === b)
  }
}
