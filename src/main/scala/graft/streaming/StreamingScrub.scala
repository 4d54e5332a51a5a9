package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental exact-substring scrub: the streaming face of `dd10` —
  * scrub-as-you-ingest. Each arriving micro-batch of documents is
  * scrubbed against every 8-gram seen SO FAR (persistent gram-count
  * state, plus the batch's own grams: batch-internal duplicates count),
  * and the cleaned documents are appended to the output exactly once.
  *
  * Semantics are PREFIX-CONSISTENT like the other streaming dedup
  * twins (sm3's first-seen-wins): a document already emitted is not
  * re-scrubbed when a LATER document duplicates one of its grams — at
  * ingest time the earlier copy was unique. The DuckDB oracle replays
  * exactly this: an occurrence is covered iff its gram's cumulative
  * count over batches ≤ its own batch reaches 2.
  *
  * REPLAY-IDEMPOTENT: foreachBatch is at-least-once, so both the state
  * append and the output append are keyed by batchId and written with
  * overwrite — a crash between the two and a replay rewrites the same
  * `batch=<id>` partitions instead of double-counting the batch's own
  * grams (which would over-scrub it) or duplicating output rows. The
  * state read excludes the current batch's partition for the same
  * reason: a replayed batch must see exactly the pre-batch state.
  *
  * 100 TB shape: state is one (gram, n) row per distinct gram per batch
  * — aggregated at read, far smaller than the corpus — and each batch
  * does one join of ITS grams (8-byte keys) against that state; the
  * scrub itself is row-local (`Dedup.scrubFrame`).
  */
object StreamingScrub {

  private def stateExists(spark: SparkSession, stateDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // at least one committed batch partition (not just a crashed shell)
    fs.exists(path) && fs.listStatus(path).nonEmpty
  }

  /** Scrub one batch against the gram-count state; overwrites this
    * batch's (gram, n) state partition and returns the scrubbed rows.
    */
  def scrubBatch(
      spark: SparkSession,
      batch: DataFrame,
      stateDir: String,
      batchId: Long): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val base = batch.select(col("doc_id"), col("text"))
    val toks = base.select(col("doc_id"), split(col("text"), " ").as("toks"))
    val grams = Dedup.gramOccurrences(base, Dedup.ScrubW)
    val batchCounts = grams.groupBy("gram").agg(count(lit(1)).as("n"))
    val totals =
      if (stateExists(spark, stateDir)) {
        // partition discovery surfaces `batch`; excluding this batch's id
        // makes a replay see exactly the pre-batch state
        val seen = spark.read.parquet(stateDir)
          .filter(col("batch") =!= batchId)
          .groupBy("gram").agg(sum("n").as("n_seen"))
        batchCounts.join(seen, Seq("gram"), "left")
          .select(col("gram"), (col("n") + coalesce(col("n_seen"), lit(0L))).as("n_total"))
      } else batchCounts.select(col("gram"), col("n").as("n_total"))
    val dup = totals.filter(col("n_total") >= 2).select("gram")
    val starts = grams.join(dup, "gram")
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("i"))).as("starts"))
    // sever lineage BEFORE the state write: the returned frame must not
    // re-evaluate its dup decision against a state dir that now already
    // contains this batch's counts
    val out = Dedup.scrubFrame(toks.join(starts, Seq("doc_id"), "left"), Dedup.ScrubW)
      .localCheckpoint(true)
    batchCounts.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    out
  }

  /** File-stream wrapper: one staged file per micro-batch, scrubbed
    * rows landed under `outDir/batch=<id>` (idempotent on replay), gram
    * counts accumulated per-batch in `stateDir`.
    */
  def scrubStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      stateDir: String,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          scrubBatch(batch.sparkSession, batch, stateDir, batchId)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
