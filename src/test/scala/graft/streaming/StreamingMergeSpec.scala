package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** StreamingMerge invariants beyond sm9's oracle row-hash: delete/upsert
  * semantics per batch, and the copy-on-write guarantee — buckets a
  * batch doesn't touch keep their files byte-identical (same mtime).
  */
class StreamingMergeSpec extends SparkSpec {

  import spark.implicits._

  private def readState(path: String) =
    spark.read.parquet(path).select("k", "v").orderBy("k")

  test("applyBatch rewrites only affected buckets; others keep their files") {
    val state = Files.createTempDirectory("graft_merge_spec").resolve("state").toString
    val snap = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (8L, "e")).toDF("k", "v")
    StreamingMerge.seedSnapshot(snap, "k", state, numBuckets = 4)

    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fileStamps(bucket: Int): Map[String, Long] =
      fs.listStatus(new Path(s"$state/bucket=$bucket")).toSeq
        .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val untouched2 = fileStamps(2)
    val untouched3 = fileStamps(3)

    // batch touches buckets 0 (update k=0, insert k=4, delete k=8) and 1 (delete k=1)
    val batch = Seq(
      (0L, "update", "A"), (4L, "insert", "X"), (8L, "delete", null),
      (1L, "delete", null)).toDF("k", "change_type", "new_v")
    StreamingMerge.applyBatch(spark, batch, "k", state, numBuckets = 4, batchId = 0L,
      toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))

    assert(readState(state).as[(Long, String)].collect().toSeq ===
      Seq((0L, "A"), (2L, "c"), (3L, "d"), (4L, "X")))
    // copy-on-write: buckets 2 and 3 were not rewritten
    assert(fileStamps(2) === untouched2)
    assert(fileStamps(3) === untouched3)
  }

  test("vacuum removes only stale staging dirs, never live buckets or fresh staging") {
    val state = Files.createTempDirectory("graft_merge_vac").resolve("state").toString
    StreamingMerge.seedSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), "k", state, 2)
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a merge that died between write and rename
    fs.mkdirs(new Path(s"$state/.merge_7_bucket=1"))
    // default retention (24h): the just-written staging dir could belong
    // to an in-flight batch, so vacuum must NOT touch it
    assert(StreamingMerge.vacuum(spark, state).isEmpty)
    assert(fs.exists(new Path(s"$state/.merge_7_bucket=1")))
    // negative retention = "everything is stale" (test-only shortcut)
    val deleted = StreamingMerge.vacuum(spark, state, olderThanMs = -60000)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) === Seq(".merge_7_bucket=1"))
    assert(fs.exists(new Path(s"$state/bucket=0")) && fs.exists(new Path(s"$state/bucket=1")))
    assert(readState(state).count() === 2)
    assert(StreamingMerge.vacuum(spark, state, olderThanMs = -60000).isEmpty) // idempotent
  }

  test("vacuum never deletes an .old dir that is a bucket's only copy") {
    val state = Files.createTempDirectory("graft_merge_sole").resolve("state").toString
    StreamingMerge.seedSnapshot(Seq((0L, "a"), (1L, "b")).toDF("k", "v"), "k", state, 2)
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: bucket=1 renamed aside, commit rename never happened.
    // rename preserves mtime, so ANY retention (here: "everything is
    // stale") would age-qualify the .old dir — the live-dir-missing
    // guard must still protect it.
    assert(fs.rename(new Path(s"$state/bucket=1"), new Path(s"$state/.old_9_bucket=1")))
    assert(StreamingMerge.vacuum(spark, state, olderThanMs = -60000).isEmpty)
    assert(fs.exists(new Path(s"$state/.old_9_bucket=1")), "sole survivor deleted")
    // once the bucket is live again the displaced copy is redundant and
    // age-based deletion applies
    assert(fs.rename(new Path(s"$state/.old_9_bucket=1"), new Path(s"$state/bucket=1")))
    fs.mkdirs(new Path(s"$state/.old_10_bucket=1"))
    val deleted = StreamingMerge.vacuum(spark, state, olderThanMs = -60000)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) === Seq(".old_10_bucket=1"))
  }

  test("crash between aside-rename and commit rename: replay restores the bucket") {
    val state = Files.createTempDirectory("graft_merge_crash").resolve("state").toString
    StreamingMerge.seedSnapshot(
      Seq((0L, "a"), (2L, "b"), (4L, "c")).toDF("k", "v"), "k", state, numBuckets = 2)
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the worst crash window of batch 5 on bucket 0: live dir
    // already renamed aside, staging not yet renamed in
    assert(fs.rename(new Path(s"$state/bucket=0"), new Path(s"$state/.old_5_bucket=0")))
    fs.mkdirs(new Path(s"$state/.merge_5_bucket=0")) // dead staging remnant
    assert(!fs.exists(new Path(s"$state/bucket=0")))
    // checkpoint replays batch 5
    StreamingMerge.applyBatch(spark,
      Seq((0L, "update", "A")).toDF("k", "change_type", "new_v"),
      "k", state, numBuckets = 2, batchId = 5L,
      toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))
    // k=2 and k=4 lived ONLY in the displaced copy — they must survive
    assert(readState(state).as[(Long, String)].collect().toSeq ===
      Seq((0L, "A"), (2L, "b"), (4L, "c")))
    assert(!fs.exists(new Path(s"$state/.old_5_bucket=0"))) // swap completed
  }

  test("sequential batches compose: later upsert wins, re-insert after delete works") {
    val state = Files.createTempDirectory("graft_merge_spec2").resolve("state").toString
    StreamingMerge.seedSnapshot(Seq((1L, "a")).toDF("k", "v"), "k", state, numBuckets = 2)
    val apply = (rows: Seq[(Long, String, String)], id: Long) =>
      StreamingMerge.applyBatch(spark, rows.toDF("k", "change_type", "new_v"),
        "k", state, numBuckets = 2, batchId = id,
        toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))
    apply(Seq((1L, "delete", null), (2L, "insert", "b")), 0L)
    apply(Seq((1L, "insert", "a2"), (2L, "update", "b2")), 1L)
    assert(readState(state).as[(Long, String)].collect().toSeq ===
      Seq((1L, "a2"), (2L, "b2")))
  }

  test("manifest brackets the batch: a crash between bucket renames is detectable and replayable") {
    val state = Files.createTempDirectory("graft_merge_manifest").resolve("state").toString
    StreamingMerge.seedSnapshot(
      Seq((0L, "a0"), (1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "v"),
      "k", state, numBuckets = 2)
    val batch = Seq((0L, "update", "b0"), (1L, "update", "b1"))
      .toDF("k", "change_type", "new_v")
    def applyB(): Unit = StreamingMerge.applyBatch(spark, batch, "k", state,
      numBuckets = 2, batchId = 7L,
      toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))

    // die right after bucket 0's commit rename — the mid-batch window
    // where some buckets carry new content and some old
    StreamingMerge.crashAfterBucket = Some(0L)
    try intercept[Exception](applyB())
    finally StreamingMerge.crashAfterBucket = None

    // DETECTABLE: the manifest survives the crash, so the snapshot is
    // flagged as a possibly-mixed prefix instead of silently trusted
    assert(StreamingMerge.pendingBatches(spark, state) === Seq(7L))

    // REPLAYABLE: re-running the same batch (the checkpoint's contract)
    // restores a consistent committed snapshot...
    applyB()
    assert(StreamingMerge.pendingBatches(spark, state).isEmpty)
    assert(readState(state).as[(Long, String)].collect().toSeq ===
      Seq((0L, "b0"), (1L, "b1"), (2L, "a2"), (3L, "a3")))
    // ...with no staging or displaced leftovers
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new Path(state)).map(_.getPath.getName)
      .filter(n => n.startsWith(".merge_") || n.startsWith(".old_") ||
        n.startsWith(".manifest_"))
    assert(leftovers.isEmpty, s"leftovers: ${leftovers.mkString(", ")}")
  }

  test("readCommitted is snapshot-isolated: pre-batch during a crashed swap, post-batch after") {
    val state = Files.createTempDirectory("graft_merge_iso").resolve("state").toString
    StreamingMerge.seedSnapshot(
      Seq((0L, "a0"), (1L, "a1"), (2L, "a2"), (3L, "a3")).toDF("k", "v"),
      "k", state, numBuckets = 2)
    val batch = Seq((0L, "update", "b0"), (1L, "update", "b1"))
      .toDF("k", "change_type", "new_v")
    def applyB(): Unit = StreamingMerge.applyBatch(spark, batch, "k", state,
      numBuckets = 2, batchId = 9L,
      toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))

    // Construct the canonical mid-swap crash state DETERMINISTICALLY
    // (the injected-crash path races the other bucket's concurrent
    // future): manifest published for buckets {0, 1}; bucket 0 fully
    // swapped (live = post-batch, displaced pre-batch copy beside it);
    // bucket 1 untouched. This is exactly the state a crash between the
    // two commit renames leaves behind.
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mOut = fs.create(new Path(s"$state/.manifest_9"), true)
    try mOut.write("0\n1".getBytes("UTF-8")) finally mOut.close()
    require(fs.rename(new Path(s"$state/bucket=0"), new Path(s"$state/.old_9_bucket=0")))
    Seq((0L, "b0"), (2L, "a2")).toDF("k", "v")
      .write.parquet(s"$state/bucket=0")

    val plain = readState(state).as[(Long, String)].collect().toSeq
    assert(plain === Seq((0L, "b0"), (1L, "a1"), (2L, "a2"), (3L, "a3")),
      "precondition: the raw dir read DOES observe the mixed prefix")

    // ...but the committed read reconstructs the pre-batch snapshot
    // from the surviving displaced copies — no mixed state observable
    val committed = StreamingMerge.readCommitted(spark, state)
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(committed === Seq((0L, "a0"), (1L, "a1"), (2L, "a2"), (3L, "a3")))

    // replay to completion: the manifest delete commits the batch
    // atomically, and the same call now returns the post-batch snapshot
    applyB()
    val after = StreamingMerge.readCommitted(spark, state)
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(after === Seq((0L, "b0"), (1L, "b1"), (2L, "a2"), (3L, "a3")))
  }

  test("readCommitted excludes a batch-created bucket from the pre-batch snapshot") {
    val state = Files.createTempDirectory("graft_merge_newb").resolve("state").toString
    // seed puts everything in bucket 0; the batch INSERTS the first-ever
    // key of bucket 1, so bucket 1 has no pre-batch dir and no .old copy
    StreamingMerge.seedSnapshot(
      Seq((0L, "a0"), (2L, "a2")).toDF("k", "v"), "k", state, numBuckets = 2)
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // canonical crash window, constructed deterministically: manifest
    // published for {0 pre-existing, 1 new}; NEW bucket 1 already
    // commit-renamed (live = post-batch); bucket 0 not yet swapped
    val mOut = fs.create(new Path(s"$state/.manifest_4"), true)
    try mOut.write("0\n1:new".getBytes("UTF-8")) finally mOut.close()
    Seq((1L, "b1")).toDF("k", "v").write.parquet(s"$state/bucket=1")

    val plain = readState(state).as[(Long, String)].collect().toSeq
    assert(plain === Seq((0L, "a0"), (1L, "b1"), (2L, "a2")),
      "precondition: the raw dir read DOES observe the mixed prefix")

    // committed read: bucket 1 did not exist pre-batch, so its
    // post-batch rows must NOT ride alongside bucket 0's pre-batch rows
    val committed = StreamingMerge.readCommitted(spark, state)
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(committed === Seq((0L, "a0"), (2L, "a2")))

    // replay to completion: post-commit the insert is visible
    StreamingMerge.applyBatch(spark,
      Seq((1L, "insert", "b1"), (0L, "update", "b0")).toDF("k", "change_type", "new_v"),
      "k", state, numBuckets = 2, batchId = 4L,
      toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))
    val after = StreamingMerge.readCommitted(spark, state)
      .select("k", "v").orderBy("k").as[(Long, String)].collect().toSeq
    assert(after === Seq((0L, "b0"), (1L, "b1"), (2L, "a2")))
    assert(StreamingMerge.pendingBatches(spark, state).isEmpty)
  }

  test("two displaced copies for one bucket fail loudly instead of restoring a stale one") {
    val state = Files.createTempDirectory("graft_merge_dup_old").resolve("state").toString
    StreamingMerge.seedSnapshot(Seq((0L, "a")).toDF("k", "v"), "k", state, numBuckets = 1)
    val fs = new Path(state).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the single-writer invariant violated: two .old copies (e.g. two
    // merge queries sharing a statePath); lexicographic glob order would
    // pick .old_19 over .old_2 — the GUARD must fire instead
    fs.mkdirs(new Path(s"$state/.old_19_bucket=0"))
    fs.mkdirs(new Path(s"$state/.old_2_bucket=0"))
    require(fs.delete(new Path(s"$state/bucket=0"), true))
    val e = intercept[Exception] {
      StreamingMerge.applyBatch(spark,
        Seq((0L, "update", "x")).toDF("k", "change_type", "new_v"),
        "k", state, numBuckets = 1, batchId = 21L,
        toUpsert = ch => ch.select(col("k"), col("new_v").as("v")))
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("more than one merge query")))
  }
}
