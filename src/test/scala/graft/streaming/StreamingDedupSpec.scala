package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** Incremental dedup semantics: within-batch duplicates collapse to the
  * smallest doc_id, cross-batch duplicates never re-enter the store, and
  * the streaming wrapper processes each file exactly once.
  */
class StreamingDedupSpec extends SparkSpec {

  import spark.implicits._

  test("cross-batch duplicates are dropped; first-seen wins") {
    val state = Files.createTempDirectory("dedup-state").toString + "/store"

    val b1 = Seq((1L, "alpha"), (2L, "beta"), (5L, "alpha")).toDF("doc_id", "text")
    val added1 = StreamingDedup.dedupBatch(spark, b1, state)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(added1 === Map(1L -> "alpha", 2L -> "beta")) // 5 collapsed into 1

    val b2 = Seq((7L, "beta"), (8L, "gamma")).toDF("doc_id", "text")
    val added2 = StreamingDedup.dedupBatch(spark, b2, state)
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(added2 === Map(8L -> "gamma")) // beta already canonical

    val store = spark.read.parquet(state)
    assert(store.count() === 3)
    assert(store.select("text").collect().map(_.getString(0)).toSet
      === Set("alpha", "beta", "gamma"))
  }

  test("streaming wrapper dedups file drops with exactly-once semantics") {
    val root = Files.createTempDirectory("dedup-stream").toString
    val landing = s"$root/landing"
    val state = s"$root/store"
    val chk = s"$root/chk"
    Files.createDirectories(java.nio.file.Paths.get(landing))

    def drop(rows: Seq[(Long, String)], name: String): Unit =
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$landing/$name")

    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    drop(Seq((1L, "alpha"), (2L, "beta")), "f1")
    StreamingDedup.dedupStream(spark, s"$landing/*", schema, state, chk).awaitTermination()
    drop(Seq((3L, "alpha"), (4L, "delta")), "f2")
    StreamingDedup.dedupStream(spark, s"$landing/*", schema, state, chk).awaitTermination()

    val store = spark.read.parquet(state)
    assert(store.count() === 3)
    assert(store.filter("text = 'alpha'").select("doc_id").head().getLong(0) === 1L)
  }
}
