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
  *     because the rename is the commit point.
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

  /** Remove leftover `.merge_*` staging directories from merges that
    * crashed BEFORE their rename commit — the vacuum every
    * copy-on-write lake runs periodically. Safe under live readers and
    * writers: a staging dir is only ever renamed away by its own batch,
    * so anything still named `.merge_*` is dead (and dot-prefixed, so
    * readers never see it). Returns the deleted paths.
    */
  def vacuum(spark: SparkSession, statePath: String): Seq[String] = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".merge_"))
      .map { s => fs.delete(s.getPath, true); s.getPath.toString }
  }

  /** One MERGE application: rewrite exactly the affected buckets. */
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
          val changes = b.filter(col("_bucket") === bk).drop("_bucket")
          val upserts = toUpsert(changes.filter(col("change_type") =!= "delete"))
          val next =
            if (fs.exists(dir))
              spark.read.parquet(dir.toString)
                .join(broadcast(changes.select(keyCol)), Seq(keyCol), "left_anti")
                .unionByName(upserts)
            else upserts
          // write beside, then rename — the rename is the commit point
          val tmp = new Path(s"$statePath/.merge_${batchId}_bucket=$bk")
          next.write.mode("overwrite").parquet(tmp.toString)
          if (fs.exists(dir)) fs.delete(dir, true)
          fs.rename(tmp, dir)
        }
      }, Duration.Inf)
      finally pool.shutdown()
    } finally b.unpersist()
  }
}
