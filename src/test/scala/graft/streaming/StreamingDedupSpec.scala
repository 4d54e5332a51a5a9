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

  test("near-dup state suppresses a NON-identical near-duplicate across batches") {
    val state = Files.createTempDirectory("neardup-state").toString + "/buckets"

    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    // one word changed out of 30 -> word-set Jaccard 29/31 ~ 0.94: not
    // byte-identical (exact dedup would pass it), but bands collide
    val nearDup = base.replace("w17", "zz")
    val unrelated = (1 to 30).map(i => s"u$i").mkString(" ")

    val b1 = Seq((1L, base)).toDF("doc_id", "text")
    val a1 = StreamingDedup.nearDedupBatch(spark, b1, state)
      .collect().map(_.getLong(0)).toSet
    assert(a1 === Set(1L))

    val b2 = Seq((7L, nearDup), (8L, unrelated)).toDF("doc_id", "text")
    val a2 = StreamingDedup.nearDedupBatch(spark, b2, state)
      .collect().map(_.getLong(0)).toSet
    assert(a2 === Set(8L), "near-dup of an accepted doc must be suppressed")

    // replay of an already-accepted doc is suppressed too (J = 1)
    val b3 = Seq((9L, unrelated)).toDF("doc_id", "text")
    assert(StreamingDedup.nearDedupBatch(spark, b3, state).count() === 0)
  }

  test("near-dup batch-internal group collapses to the smallest doc_id") {
    val state = Files.createTempDirectory("neardup-state2").toString + "/buckets"
    val base = (1 to 30).map(i => s"v$i").mkString(" ")
    val b = Seq((5L, base.replace("v3", "aa")), (2L, base), (4L, "short unrelated text"))
      .toDF("doc_id", "text")
    val accepted = StreamingDedup.nearDedupBatch(spark, b, state)
      .collect().map(_.getLong(0)).toSet
    assert(accepted === Set(2L, 4L), "min doc_id canonical, near-dup 5 collapsed")
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
