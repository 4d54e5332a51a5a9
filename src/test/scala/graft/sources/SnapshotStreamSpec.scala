package graft.sources

import graft.SparkSpec
import graft.operators.SnapshotLog
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The snapshot-log streaming source and sink: exactly-once drains in both
  * modes, invisibility of read-invariant rewrites, refusal (or
  * opt-in skip) of data-changing commits in appends mode, checkpointed
  * kill-and-resume under rate limiting, and schema pinning across
  * field-id evolution.
  */
class SnapshotStreamSpec extends SparkSpec {

  import spark.implicits._

  private def newDirs(): (String, String, String) = {
    val root = Files.createTempDirectory("graft_snapstream")
    (root.resolve("log").toString, root.resolve("sink").toString,
      root.resolve("ckpt").toString)
  }

  private def drain(log: String, sink: String, ckpt: String,
      options: Map[String, String] = Map.empty): Unit = {
    val q = options.foldLeft(
      spark.readStream.format("snapshot-log")) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load(log)
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("readStream.table over the catalog streams the appends feed") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.append(spark, log, Seq((3L, "c")).toDF("k", "v"))
    spark.conf.set("spark.sql.catalog.smcat",
      classOf[SnapshotCatalog].getName)
    spark.readStream
      .option("maxSnapshotsPerTrigger", 1)
      .table(s"smcat.`$log`")
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    assert(rowSet(spark.read.parquet(sink)) ==
      Seq(Seq("1", "a"), Seq("2", "b"), Seq("3", "c")))
    // incremental resume: a new commit drains from the checkpoint
    SnapshotLog.append(spark, log, Seq((4L, "d")).toDF("k", "v"))
    spark.readStream.table(s"smcat.`$log`")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read.parquet(sink).count() == 4L)
    // the CDC feed stays on the format door, with guidance
    val e = intercept[Exception] {
      spark.readStream.option("mode", "changelog").table(s"smcat.`$log`")
        .writeStream.format("noop").start()
    }
    assert(e.getMessage.contains("changelog") ||
      String.valueOf(e.getCause).contains("changelog"))
  }

  test("readStream.table over snap.t.changes streams the live CDC feed") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    SnapshotLog.append(spark, log, Seq((3L, "c")).toDF("k", "v"))
    SnapshotLog.deleteWhere(spark, log,
      org.apache.spark.sql.functions.col("k") === 2L)
    spark.conf.set("spark.sql.catalog.smcat",
      classOf[SnapshotCatalog].getName)
    spark.readStream
      .table(s"smcat.`$log`.changes")
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    // the stream projects to the BATCH changes table's columns
    // (k, v, change) — no snapshot_id leaks through the identifier
    val got = spark.read.parquet(sink)
    assert(got.columns.toSeq.sorted == Seq("change", "k", "v"))
    assert(rowSet(got) == Seq(
      Seq("1", "a", "insert"), Seq("2", "b", "insert"),
      Seq("2", "b", "delete"), Seq("3", "c", "insert")).sortBy(_.mkString("")))
    // live resume from the checkpoint: one more commit, only its delta
    SnapshotLog.append(spark, log, Seq((4L, "d")).toDF("k", "v"))
    spark.readStream.table(s"smcat.`$log`.changes")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    assert(spark.read.parquet(sink).count() == 5L)
    // the mode option cannot override the identifier's meaning
    val e = intercept[Exception] {
      spark.readStream.option("mode", "appends").table(s"smcat.`$log`.changes")
        .writeStream.format("noop").start()
    }
    assert(e.getMessage.contains("changelog") ||
      String.valueOf(e.getCause).contains("changelog"))
  }

  test("writeStream.toTable commits through the tagged exactly-once sink") {
    val (log, src, ckpt) = newDirs()
    spark.conf.set("spark.sql.catalog.smcat",
      classOf[SnapshotCatalog].getName)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(src)
    // the table does not exist yet: toTable creates it via the catalog
    spark.readStream.schema("k BIGINT, v STRING").parquet(src)
      .writeStream.format("snapshot-log")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable(s"smcat.`$log`")
      .awaitTermination()
    assert(rowSet(SnapshotLog.read(spark, log)) ==
      Seq(Seq("1", "a"), Seq("2", "b")))
    // the commit is the tagged sink commit — replay-detectable
    assert(SnapshotLog.operationOf(spark, log,
      SnapshotLog.currentId(spark, log)).startsWith("stream-append="))
    // a pinned read can never be a stream-write target
    SnapshotLog.tag(spark, log, "pin")
    intercept[Exception] {
      spark.readStream.schema("k BIGINT, v STRING").parquet(src)
        .writeStream.format("snapshot-log")
        .option("checkpointLocation", ckpt + "2")
        .toTable(s"smcat.`$log` VERSION AS OF 1")
    }
  }

  test("appends drain emits each append exactly once, rewrites never") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log,
      (1 to 40).filter(_ % 2 == 0).map(k => (k, s"v$k")).toDF("k", "v")
        .repartition(3))
    SnapshotLog.optimize(spark, log, "k", 2)
    // layout declarations, the sorted rewrite, spec evolution, and a
    // metadata-only ADD COLUMN are content-invariant too: none may
    // fail the stream or re-emit rows (the added column is invisible
    // under the stream's pinned schema)
    SnapshotLog.setSortOrder(spark, log, Seq(SnapshotLog.SortField("k")))
    SnapshotLog.optimizeSorted(spark, log, 2)
    SnapshotLog.setPartitionSpec(spark, log,
      Seq(SnapshotLog.PartField("bucket", "k", 4)))
    SnapshotLog.append(spark, log,
      (1 to 40).filter(_ % 2 == 1).map(k => (k, s"v$k")).toDF("k", "v")
        .repartition(3))
    SnapshotLog.addColumn(spark, log, "note",
      org.apache.spark.sql.types.StringType)
    drain(log, sink, ckpt, Map("maxSnapshotsPerTrigger" -> "1"))
    val got = spark.read.parquet(sink)
    assert(got.count() === 40L)
    // the metadata-only ADD COLUMN reads NULL for all replayed rows
    assert(got.schema.fieldNames.contains("note") &&
      got.filter(col("note").isNotNull).isEmpty)
    assert(rowSet(got.select("k", "v")) ===
      rowSet((1 to 40).map(k => (k, s"v$k")).toDF("k", "v")))
  }

  test("checkpointed resume under rate limiting is exactly-once") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 10).map(k => (k, "a")).toDF("k", "v"))
    SnapshotLog.append(spark, log, (11 to 20).map(k => (k, "b")).toDF("k", "v"))
    drain(log, sink, ckpt, Map("maxSnapshotsPerTrigger" -> "1"))
    assert(spark.read.parquet(sink).count() === 20L)
    // the table keeps committing; a SECOND query over the SAME
    // checkpoint (a restart) must emit only the new snapshots
    SnapshotLog.append(spark, log, (21 to 25).map(k => (k, "c")).toDF("k", "v"))
    SnapshotLog.append(spark, log, (26 to 30).map(k => (k, "d")).toDF("k", "v"))
    drain(log, sink, ckpt, Map("maxSnapshotsPerTrigger" -> "1"))
    val got = spark.read.parquet(sink)
    assert(got.count() === 30L)
    assert(rowSet(got.select("k")) === rowSet((1 to 30).toDF("k")))
    // and a third drain with nothing new emits nothing
    drain(log, sink, ckpt, Map("maxSnapshotsPerTrigger" -> "1"))
    assert(spark.read.parquet(sink).count() === 30L)
  }

  test("changelog mode streams every transition's delta with its snapshot id") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log,
      (1 to 12).map(k => (k, if (k % 4 == 0) "drop" else "keep")).toDF("k", "v"))
    SnapshotLog.deleteWhere(spark, log, col("v") === "drop")
    drain(log, sink, ckpt, Map("mode" -> "changelog"))
    val got = spark.read.parquet(sink)
    assert(got.filter(col("change") === "insert" && col("snapshot_id") === 1)
      .count() === 12L)
    assert(rowSet(got.filter(col("change") === "delete").select("k")) ===
      rowSet(Seq(4, 8, 12).toDF("k")))
    // the CDC feed folds back to the table: inserts minus deletes
    assert(got.filter(col("change") === "insert").count() -
      got.filter(col("change") === "delete").count() ===
      SnapshotLog.read(spark, log).count())
  }

  test("changelog mode surfaces an equality delete's row-level delta") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 10).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.deleteWhereEqual(spark, log, Seq(3, 7).toDF("k"))
    drain(log, sink, ckpt, Map("mode" -> "changelog"))
    val got = spark.read.parquet(sink)
    assert(rowSet(got.filter(col("change") === "delete").select("k")) ===
      rowSet(Seq(3, 7).toDF("k")))
  }

  test("a data-changing commit fails an appends stream with the real constraint") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 10).map(k => (k, "x")).toDF("k", "v"))
    SnapshotLog.deleteWhere(spark, log, col("k") === 5)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(log, sink, ckpt)
    }
    assert(e.getMessage.contains("data-changing") ||
      Option(e.getCause).exists(_.getMessage.contains("data-changing")))
  }

  test("skipChangeCommits drains past deletes, emitting appends only") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 10).map(k => (k, "x")).toDF("k", "v"))
    SnapshotLog.deleteWhere(spark, log, col("k") <= 3)
    SnapshotLog.append(spark, log, (11 to 15).map(k => (k, "y")).toDF("k", "v"))
    drain(log, sink, ckpt, Map("skipChangeCommits" -> "true"))
    // the appends, verbatim — the delete is invisible by request
    assert(rowSet(spark.read.parquet(sink).select("k")) ===
      rowSet(((1 to 10) ++ (11 to 15)).toDF("k")))
  }

  test("startingSnapshot opens the stream after the named snapshot") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 5).map(k => (k, "old")).toDF("k", "v"))
    SnapshotLog.append(spark, log, (6 to 9).map(k => (k, "new")).toDF("k", "v"))
    drain(log, sink, ckpt, Map("startingSnapshot" -> "1"))
    assert(rowSet(spark.read.parquet(sink).select("k")) ===
      rowSet((6 to 9).toDF("k")))
  }

  test("pre-evolution history replays under the pinned schema via field ids") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 6).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.renameColumn(spark, log, "k", "key_id")
    SnapshotLog.append(spark, log,
      (7 to 9).map(k => (k, s"v$k")).toDF("key_id", "v"))
    drain(log, sink, ckpt)
    val got = spark.read.parquet(sink)
    assert(got.columns.toSeq === Seq("key_id", "v"))
    assert(rowSet(got.select("key_id")) === rowSet((1 to 9).toDF("key_id")))
  }

  test("a widen fails the appends stream with the re-pin message") {
    val (log, sink, ckpt) = newDirs()
    SnapshotLog.append(spark, log, (1 to 5).map(k => (k, s"v$k")).toDF("k", "v"))
    SnapshotLog.widenColumn(spark, log, "k",
      org.apache.spark.sql.types.LongType)
    SnapshotLog.append(spark, log,
      (6L to 9L).map(k => (k, s"v$k")).toDF("k", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(log, sink, ckpt)
    }
    def hasRePin(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("re-pin")) ||
        hasRePin(t.getCause))
    assert(hasRePin(e))
  }

  test("sink writes one tagged snapshot per micro-batch, exactly-once") {
    val (landing0, logDir, ckpt) = newDirs()
    val landing = Files.createDirectories(java.nio.file.Paths.get(landing0))
    Seq((1, "a"), (2, "a")).toDF("k", "v").coalesce(1)
      .write.parquet(landing.resolve("b0").toString)
    Seq((3, "b"), (4, "b")).toDF("k", "v").coalesce(1)
      .write.parquet(landing.resolve("b1").toString)
    val q = spark.readStream
      .schema(Seq((1, "a")).toDF("k", "v").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/*")
      .writeStream.format("snapshot-log")
      .option("path", logDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rowSet(SnapshotLog.read(spark, logDir)) ===
      rowSet(Seq((1, "a"), (2, "a"), (3, "b"), (4, "b")).toDF("k", "v")))
    // every commit carries its (streamId, batchId) tag
    val ops = SnapshotLog.history(spark, logDir).map(_.operation)
    assert(ops.forall(_.startsWith("stream-append=default:")))
    assert(SnapshotLog.lastStreamBatch(spark, logDir, "default").isDefined)
    // a RERUN over the same checkpoint re-delivers nothing
    val before = SnapshotLog.currentId(spark, logDir)
    val q2 = spark.readStream
      .schema(Seq((1, "a")).toDF("k", "v").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$landing/*")
      .writeStream.format("snapshot-log")
      .option("path", logDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(SnapshotLog.currentId(spark, logDir) === before)
  }

  test("a replayed addBatch is value-idempotent even across maintenance commits") {
    val (_, logDir, _) = newDirs()
    SnapshotLog.append(spark, logDir, Seq((0, "seed")).toDF("k", "v"))
    val sink = new SnapshotLogSink(spark, logDir, "s1")
    // a plain batch frame stands in for the engine's already-planned
    // micro-batch frame (batchOf's rebind is a no-op on it); the
    // engine-path rebind is covered by the end-to-end sink tests
    def frame() = Seq((1, "x"), (2, "x")).toDF("k", "v")
    sink.addBatch(0, frame())
    assert(SnapshotLog.read(spark, logDir).count() === 3L)
    // maintenance between delivery and replay must not fool the walk
    SnapshotLog.optimize(spark, logDir, "k", 1)
    sink.addBatch(0, frame()) // crash-replay of the SAME batch
    assert(SnapshotLog.read(spark, logDir).count() === 3L)
    sink.addBatch(1, frame()) // a genuinely new batch still lands
    assert(SnapshotLog.read(spark, logDir).count() === 5L)
    // two streams interleave without stealing each other's cursor
    val other = new SnapshotLogSink(spark, logDir, "s2")
    other.addBatch(0, frame())
    assert(SnapshotLog.lastStreamBatch(spark, logDir, "s1") === Some(1L))
    assert(SnapshotLog.lastStreamBatch(spark, logDir, "s2") === Some(0L))
  }

  test("sink mergeKeys mode upserts scan-free with idempotent replay") {
    val (_, logDir, _) = newDirs()
    val sink = new SnapshotLogSink(spark, logDir, "up", Seq("k"))
    sink.addBatch(0, (1 to 10).map(k => (k, s"v$k")).toDF("k", "v"))
    // the bootstrap goes through the merge itself (atomic against a
    // racing first commit), tagged like any upsert batch
    assert(SnapshotLog.operationOf(spark, logDir, 1L) === "stream-upsert=up:0")
    sink.addBatch(1, Seq((3, "up3"), (42, "new42")).toDF("k", "v"))
    assert(SnapshotLog.operationOf(spark, logDir, 2L) === "stream-upsert=up:1")
    val cur = SnapshotLog.read(spark, logDir)
    assert(cur.count() === 11L)
    assert(rowSet(cur.filter(col("k").isin(3, 42)).select("v")) ===
      rowSet(Seq("up3", "new42").toDF("v")))
    // crash-replay of either batch is detected from the tag walk
    sink.addBatch(1, Seq((3, "evil"), (43, "evil")).toDF("k", "v"))
    sink.addBatch(0, Seq((9, "evil")).toDF("k", "v"))
    assert(SnapshotLog.currentId(spark, logDir) === 2L)
    assert(rowSet(SnapshotLog.read(spark, logDir)) === rowSet(cur))
  }

  test("an empty upsert batch advances the cursor without evolving the schema") {
    val (_, logDir, _) = newDirs()
    val sink = new SnapshotLogSink(spark, logDir, "e", Seq("k"))
    sink.addBatch(0, Seq((1, "a")).toDF("k", "v"))
    // empty batch carrying an EXTRA column the table lacks: the cursor
    // must advance (write-ahead parity with append mode) but the
    // column must NOT leak into the table schema just because the
    // batch happened to be empty
    sink.addBatch(1, Seq.empty[(Int, String, Int)].toDF("k", "v", "extra"))
    assert(SnapshotLog.lastStreamBatch(spark, logDir, "e") === Some(1L))
    assert(SnapshotLog.read(spark, logDir).columns.toSeq === Seq("k", "v"))
    assert(SnapshotLog.read(spark, logDir).count() === 1L)
    // and the replay of the empty batch is a no-op too
    sink.addBatch(1, Seq((9, "evil")).toDF("k", "v"))
    assert(SnapshotLog.read(spark, logDir).count() === 1L)
  }

  test("lake-to-lake: snapshot-log source feeding a snapshot-log sink") {
    val (_, srcLog, ckpt) = newDirs()
    val dstLog = Files.createTempDirectory("graft_snapstream_dst")
      .resolve("log").toString
    SnapshotLog.append(spark, srcLog, (1 to 8).map(k => (k, "u")).toDF("k", "v"))
    SnapshotLog.append(spark, srcLog, (9 to 12).map(k => (k, "w")).toDF("k", "v"))
    val q = spark.readStream.format("snapshot-log")
      .option("maxSnapshotsPerTrigger", 1)
      .load(srcLog)
      .writeStream.format("snapshot-log")
      .option("path", dstLog)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(rowSet(SnapshotLog.read(spark, dstLog)) ===
      rowSet(SnapshotLog.read(spark, srcLog)))
    // and the mirrored table is itself streamable: its commits are
    // stream-appends, which the source treats as append-class
    assert(SnapshotLog.history(spark, dstLog)
      .forall(_.operation.startsWith("stream-append=")))
  }
}
