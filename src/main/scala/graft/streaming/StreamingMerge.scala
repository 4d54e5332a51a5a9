package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental MERGE warehouse load — the copy-on-write successor to
  * `IncrementalLoad`'s WRITE_TRUNCATE refresh (the reference's load
  * semantics, `bigquery_loader_function/main.py:36-45`). A CDC changelog
  * stream (insert/update/delete rows, `ChangeCapture`'s output shape)
  * applies to a keyed snapshot per micro-batch with work proportional
  * to the CHANGED data, not the table:
  *
  *   - the snapshot lives bucket-partitioned by key
  *     (`statePath/bucket=N/`) — the same hash-bucket layout
  *     ScaleTechniques uses for co-located joins;
  *   - each micro-batch rewrites ONLY the buckets its keys hash into
  *     (upsert = anti-join out replaced keys + union new rows; delete =
  *     anti-join only), leaving every untouched bucket's files byte-
  *     identical on disk — asserted by mtime in StreamingMergeSpec;
  *   - at 100 TB with B buckets, a batch touching k keys costs
  *     O(k/B-th of the table) I/O instead of a full rewrite. Table
  *     formats (Delta/Iceberg/Hudi) commit the same rewrite as a
  *     manifest swap; the directory-rename here is the same protocol
  *     with the filesystem as the manifest, crash-safe per bucket
  *     because the rename is the commit point;
  *   - a PER-BATCH MANIFEST makes the k bucket swaps ATOMIC to readers
  *     (Iceberg's idea with the filesystem as the log):
  *     `.manifest_<batchId>` — written to a tmp name and single-renamed
  *     in BEFORE the first swap — lists the batch's buckets; every
  *     displaced pre-batch copy (`.old_<B>_bucket=k`) survives until
  *     the batch completes; the manifest DELETE is the commit point (a
  *     single atomic filesystem op). [[readCommitted]] keys on it:
  *     manifest present ⇒ substitute the surviving `.old` copies and
  *     return exactly the pre-batch snapshot; manifest gone ⇒ the live
  *     dirs ARE the post-batch snapshot. A crash between renames is
  *     additionally REPLAYABLE (the checkpoint re-runs the batch;
  *     per-bucket recovery restores displaced copies; the apply is
  *     idempotent), and vacuum keys on the same no-manifest invariant.
  */
object StreamingMerge {

  /** Lay the initial snapshot out bucket-partitioned by `key % numBuckets`. */
  def seedSnapshot(
      snapshot: DataFrame, keyCol: String, statePath: String, numBuckets: Int): Unit =
    snapshot
      .withColumn("bucket", pmod(col(keyCol), lit(numBuckets.toLong)))
      .write.partitionBy("bucket").mode("overwrite").parquet(statePath)

  /** Consume changelog files from `landingDir` and apply each micro-batch
    * to the bucketed snapshot. `toUpsert` projects non-delete change rows
    * onto the snapshot schema; rows with `change_type = 'delete'` only
    * remove. Returns the started AvailableNow query.
    */
  def applyChangesStream(
      spark: SparkSession,
      landingDir: String,
      changeSchema: StructType,
      keyCol: String,
      statePath: String,
      numBuckets: Int,
      checkpointDir: String,
      toUpsert: DataFrame => DataFrame,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(changeSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) applyBatch(
          spark, batch, keyCol, statePath, numBuckets, batchId, toUpsert)
      }
      .start()
  }

  /** Remove leftover `.merge_*` staging and `.old_*` displaced-bucket
    * directories from merges that crashed mid-commit — the vacuum every
    * copy-on-write lake runs periodically. Only dirs whose mtime is older
    * than `olderThanMs` are deleted: a fresh `.merge_*` dir may belong to
    * an IN-FLIGHT batch (written, not yet renamed in) and a fresh
    * `.old_*` dir may be the only surviving copy of a bucket mid-swap —
    * deleting either would break the commit in progress. Age alone is
    * NOT sufficient for `.old_*` dirs (rename preserves mtime, so the
    * displaced copy carries the bucket's original write time): any
    * `.old_*_bucket=k` whose live `bucket=k` is missing is skipped
    * unconditionally — it is the bucket's only copy, and the next merge
    * replay restores it. Pick a retention comfortably above the longest
    * batch duration (default 24 h, a lake-maintenance norm), and do not
    * run vacuum concurrently with an active merge query against the
    * same `statePath` unless the retention honors that bound.
    * Dot-prefixed dirs are invisible to readers either way. Returns the
    * deleted paths.
    */
  /** Batches whose manifest is still present — i.e. in flight, or
    * crashed mid-swap and awaiting checkpoint replay. Empty ⇒ the live
    * bucket dirs are a consistent committed snapshot.
    */
  def pendingBatches(spark: SparkSession, statePath: String): Seq[Long] = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(".manifest_") && !n.endsWith(".tmp"))
      .map(_.stripPrefix(".manifest_").toLong).sorted
  }

  /** SNAPSHOT-ISOLATED read of the bucketed state: always the last
    * COMMITTED batch's content, even while a batch is mid-swap or died
    * between bucket renames.
    *
    * Protocol: no manifest ⇒ the live dirs are consistent — read them.
    * A pending manifest for batch B ⇒ for each affected bucket, prefer
    * the displaced `.old_B_bucket=k` copy (its pre-B version, which
    * [[applyBatch]] keeps alive until after the commit point) and fall
    * back to the live dir (bucket not yet swapped). Unaffected buckets
    * read live. The result is exactly the pre-B snapshot; after the
    * manifest delete (the atomic commit) the same call returns the
    * post-B snapshot. Readers therefore never observe a mixed prefix —
    * the property a k-rename commit cannot give on its own.
    *
    * Concurrency: consistent against a CRASHED or stalled writer (the
    * recovery-read case). Against an actively RUNNING writer the
    * listing and the scan race the writer's renames like any
    * non-locking lake read; schedule recovery reads or rely on the
    * post-commit cleanup window like other CoW lake readers.
    */
  def readCommitted(spark: SparkSession, statePath: String): DataFrame = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = spark.read.parquet(statePath)
    val pending = pendingBatches(spark, statePath)
    if (pending.isEmpty) live
    else {
      // single-writer contract: at most one batch can be mid-commit
      require(pending.size == 1,
        s"multiple pending batches $pending under $statePath: " +
          "statePath is being written by more than one merge query")
      val bId = pending.head
      // manifest lines: "<bucket>" (pre-existing) or "<bucket>:new"
      // (created by the in-flight batch). A new bucket never gets an
      // `.old` aside-copy — there is no pre-batch dir to displace — so
      // after its commit rename the live dir holds POST-batch rows;
      // without the marker those rows would leak into the reconstructed
      // pre-batch snapshot alongside other buckets' pre-batch rows (a
      // mixed prefix, the exact thing this read path forbids).
      val parsed = {
        val in = fs.open(new Path(s"$statePath/.manifest_$bId"))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).map { ln =>
            val i = ln.indexOf(':')
            if (i < 0) (ln.toLong, false)
            else (ln.substring(0, i).toLong, ln.substring(i + 1) == "new")
          }.toSeq
        finally in.close()
      }
      val newBuckets = parsed.collect { case (k, true) => k }
      val displaced = parsed.collect { case (k, false) => k }.filter(k =>
        fs.exists(new Path(s"$statePath/.old_${bId}_bucket=$k")))
      val excluded = displaced ++ newBuckets
      if (excluded.isEmpty) live
      else {
        val bucketType = live.schema("bucket").dataType
        // partition-pruned live scan of every bucket we are neither
        // substituting nor excluding as batch-created, then the
        // displaced pre-batch copies with their partition value restored
        val kept = live.filter(!col("bucket").isin(excluded.map(Long.box): _*))
        displaced.foldLeft(kept) { (acc, k) =>
          acc.unionByName(
            spark.read.parquet(s"$statePath/.old_${bId}_bucket=$k")
              .withColumn("bucket", lit(k).cast(bucketType)))
        }
      }
    }
  }

  def vacuum(
      spark: SparkSession,
      statePath: String,
      olderThanMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cutoff = System.currentTimeMillis() - olderThanMs
    // Manifest-first rule: a `.merge_B_*`/`.old_B_*` dir whose
    // `.manifest_B` still exists belongs to a pending (in-flight or
    // replayable-crashed) batch — NEVER reaped, at any age; the replay
    // owns those files. The age heuristic below only governs dirs from
    // pre-manifest writers or post-completion cleanup crashes.
    val pending = pendingBatches(spark, statePath).toSet
    def batchOf(name: String): Option[Long] = {
      val core = name.stripPrefix(".merge_").stripPrefix(".old_")
      core.takeWhile(_ != '_').toLongOption
    }
    // A `.old_*_bucket=k` whose live `bucket=k` is MISSING is the only
    // surviving copy of that bucket (crash between the aside-rename and
    // the commit rename) — and rename preserves mtime, so the age test
    // alone cannot protect it: the dir carries the bucket's original
    // write time, not the rename time. Never delete those; applyBatch's
    // replay restores them.
    def soleSurvivor(name: String): Boolean =
      name.startsWith(".old_") && {
        val bucket = name.substring(name.indexOf("_bucket=") + 1)
        name.contains("_bucket=") && !fs.exists(new Path(s"$statePath/$bucket"))
      }
    if (!fs.exists(root)) Seq.empty
    else {
      val entries = fs.listStatus(root).toSeq
      val staleDirs = entries
        .filter(s => s.isDirectory &&
          (s.getPath.getName.startsWith(".merge_") ||
            s.getPath.getName.startsWith(".old_")) &&
          !batchOf(s.getPath.getName).exists(pending.contains) &&
          s.getModificationTime <= cutoff &&
          !soleSurvivor(s.getPath.getName))
      // An aged manifest with NO surviving dirs of its batch is a
      // completion-cleanup straggler (crash after the last old-delete,
      // before the manifest delete): the live dirs are fully committed,
      // so retiring it restores the no-pending ⇒ consistent signal.
      val liveBatches = entries
        .filter(_.isDirectory).flatMap(s => batchOf(s.getPath.getName)).toSet
      val staleManifests = entries
        .filter(s => !s.isDirectory &&
          s.getPath.getName.startsWith(".manifest_") &&
          !s.getPath.getName.endsWith(".tmp") &&
          s.getModificationTime <= cutoff &&
          !s.getPath.getName.stripPrefix(".manifest_").toLongOption
            .exists(liveBatches.contains))
      // only report entries that were actually removed
      (staleDirs ++ staleManifests).flatMap(s =>
        if (fs.delete(s.getPath, true)) Some(s.getPath.toString) else None)
    }
  }

  /** Test-only fault injection: throw right after this bucket's commit
    * rename — the exact "between two bucket renames" crash window the
    * manifest protocol exists for (StreamingMergeSpec drives it; always
    * None in production paths).
    */
  private[streaming] var crashAfterBucket: Option[Long] = None

  /** One MERGE application: rewrite exactly the affected buckets,
    * bracketed by the per-batch manifest (scaladoc above).
    */
  private[streaming] def applyBatch(
      spark: SparkSession,
      batch: DataFrame,
      keyCol: String,
      statePath: String,
      numBuckets: Int,
      batchId: Long,
      toUpsert: DataFrame => DataFrame): Unit = {
    val b = batch
      .withColumn("_bucket", pmod(col(keyCol), lit(numBuckets.toLong)))
      .cache()
    try {
      // O(numBuckets)-bounded driver value (ONE aggregated row, like
      // Dedup's convergence counts) — which bucket dirs to rewrite
      val affected = b.agg(collect_set(col("_bucket")))
        .head().getSeq[Long](0).sorted
      val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // Manifest in (tmp write + single rename = atomic publish): from
      // here until the delete below, readers/vacuum treat batchId as
      // pending. Each affected bucket is marked pre-existing ("<k>") or
      // created-by-this-batch ("<k>:new") so readCommitted can exclude
      // new buckets from the pre-batch snapshot. A replay of a crashed
      // attempt KEEPS the first attempt's manifest: the affected set is
      // deterministic from the checkpointed batch, and re-probing
      // fs.exists after a partial commit would mis-mark a bucket the
      // prior attempt already created as pre-existing.
      val manifest = new Path(s"$statePath/.manifest_$batchId")
      if (!fs.exists(manifest)) {
        val manifestTmp = new Path(s"$statePath/.manifest_$batchId.tmp")
        val lines = affected.map { k =>
          if (fs.exists(new Path(s"$statePath/bucket=$k"))) k.toString
          else s"$k:new"
        }
        val mOut = fs.create(manifestTmp, true)
        try mOut.write(lines.mkString("\n").getBytes("UTF-8"))
        finally mOut.close()
        require(fs.rename(manifestTmp, manifest), s"publish of $manifest failed")
      }
      // bucket rewrites are independent — fan them out as concurrent
      // jobs (compact()'s pattern). A mid-batch crash leaves some
      // buckets applied and some not, in ANY order; that is safe
      // because the checkpoint replays the whole batch and the apply
      // is idempotent (re-anti-joining the same keys and re-unioning
      // the same upserts reproduces the same bucket content).
      import scala.concurrent.duration.Duration
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.max(1, math.min(8, affected.size)))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.traverse(affected.toSeq) { bk =>
        Future {
          val dir = new Path(s"$statePath/bucket=$bk")
          // Crash recovery: a prior attempt that died between
          // "rename live aside" and "rename staging in" leaves the
          // bucket dir missing and its ONLY surviving copy under
          // `.old_*` — restore it before reading, or every
          // pre-existing row in the bucket silently vanishes from the
          // rebuilt state. (`.old` dirs are per-batch-unique; at most
          // one can exist with the live dir missing.)
          val olds = fs.globStatus(new Path(s"$statePath/.old_*_bucket=$bk"))
            .toSeq.map(_.getPath)
          // the at-most-one-.old invariant holds only under the single-
          // writer contract; if two merge queries ever share a statePath,
          // fail loudly instead of lexicographically restoring a stale
          // copy ('.old_19_...' sorts before '.old_2_...')
          require(olds.size <= 1,
            s"multiple displaced copies for bucket $bk (${olds.mkString(", ")}): " +
              s"statePath is being written by more than one merge query")
          if (!fs.exists(dir)) olds.headOption.foreach { o =>
            require(fs.rename(o, dir), s"restore of displaced bucket $o failed")
          }
          val changes = b.filter(col("_bucket") === bk).drop("_bucket")
          val upserts = toUpsert(changes.filter(col("change_type") =!= "delete"))
          val next =
            if (fs.exists(dir))
              spark.read.parquet(dir.toString)
                .join(broadcast(changes.select(keyCol)), Seq(keyCol), "left_anti")
                .unionByName(upserts)
            else upserts
          // Commit protocol: write staging beside the live dir, rename
          // the live dir ASIDE (never delete-then-rename: a crash in
          // that window loses the bucket), rename staging in, then
          // delete the displaced copy. Every window is recoverable —
          // before the aside-rename the live dir is intact; between the
          // two renames the `.old` restore above recovers; after the
          // commit rename the new content is live and `.old` is
          // redundant. All rename/delete booleans are checked: a false
          // fails the batch so the checkpoint never commits over a
          // half-applied swap.
          val tmp = new Path(s"$statePath/.merge_${batchId}_bucket=$bk")
          next.write.mode("overwrite").parquet(tmp.toString)
          val old = new Path(s"$statePath/.old_${batchId}_bucket=$bk")
          if (fs.exists(old)) // prior attempt of THIS batch died post-commit
            require(fs.delete(old, true), s"delete of stale $old failed")
          if (fs.exists(dir))
            require(fs.rename(dir, old), s"aside-rename of $dir failed")
          require(fs.rename(tmp, dir), s"commit rename of $tmp failed")
          if (crashAfterBucket.contains(bk))
            throw new RuntimeException(s"injected crash after bucket $bk commit")
          // NOTE: the displaced `.old` copy is NOT deleted here — it is
          // the bucket's pre-batch version, and [[readCommitted]] needs
          // every affected bucket's pre-batch copy to survive until the
          // whole batch commits, or a reader during the swap window
          // could only reconstruct a mixed prefix.
        }
      }, Duration.Inf)
      finally pool.shutdown()
      // every bucket committed: the manifest delete is the batch's
      // COMMIT POINT, and it is a single atomic filesystem operation.
      // Before it, readCommitted substitutes the surviving `.old` copies
      // and reconstructs the pre-batch snapshot; after it, the live dirs
      // are the post-batch snapshot. No ordering of the k bucket renames
      // is ever observable through the committed-read path.
      require(fs.delete(manifest, false), s"completion delete of $manifest failed")
      // displaced-copy cleanup strictly AFTER the commit point: a crash
      // in this loop leaves only redundant `.old` dirs (manifest gone ⇒
      // readers take the live dirs), which vacuum retires by age.
      affected.foreach { bk =>
        val old = new Path(s"$statePath/.old_${batchId}_bucket=$bk")
        if (fs.exists(old))
          require(fs.delete(old, true), s"delete of displaced $old failed")
      }
    } finally b.unpersist()
  }
}
