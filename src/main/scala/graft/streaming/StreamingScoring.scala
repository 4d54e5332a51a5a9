package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental unigram quality scoring: the streaming face of `tx14` —
  * score-as-you-ingest. Each arriving micro-batch of documents is
  * scored by mean ln P(token) under the unigram model accumulated SO
  * FAR (persistent token-count state plus the batch's own tokens: the
  * model a curation pipeline has at the moment the document arrives),
  * and the scored rows are landed exactly once.
  *
  * PREFIX-CONSISTENT like the other streaming twins: an already-scored
  * document is not re-scored when later arrivals shift the model — its
  * recorded score reflects the model at its ingest time, which is the
  * reproducible quantity. The DuckDB oracle replays exactly that: each
  * doc's token probabilities use the cumulative counts through its own
  * batch.
  *
  * REPLAY-IDEMPOTENT: state and output writes are batchId-keyed
  * overwrites and the state read excludes the current id (the
  * StreamingScrub discipline) — an at-least-once foreachBatch replay
  * cannot double-count the batch's own tokens (which would skew every
  * probability) or duplicate output rows.
  *
  * 100 TB shape: state is one (tok, n) row per distinct token per
  * batch — vocabulary-sized, far smaller than the corpus — and each
  * batch does one aggregation of its own tokens plus one join of its
  * token set against the aggregated state; scores use the fixed-point
  * integer mean (order-free) so the recorded value is partitioning-
  * independent.
  */
object StreamingScoring {

  private def stateExists(spark: SparkSession, stateDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).nonEmpty
  }

  /** Score one batch under state ∪ batch; overwrites this batch's
    * (tok, n) state partition and returns (doc_id, n_tok, mean_logp).
    */
  def scoreBatch(
      spark: SparkSession,
      batch: DataFrame,
      stateDir: String,
      batchId: Long): DataFrame = {
    val toks = batch
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val batchCounts = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val model =
      if (stateExists(spark, stateDir)) {
        val seen = spark.read.parquet(stateDir)
          .filter(col("batch") =!= batchId)
          .groupBy("tok").agg(sum("n").as("n_seen"))
        batchCounts.join(seen, Seq("tok"), "full_outer")
          .select(col("tok"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("n_seen"), lit(0L))).as("c"))
      } else batchCounts.select(col("tok"), col("n").as("c"))
    val total = model.agg(sum("c").as("t"))
    // lp6 per model entry via LnExact — tx14's libm-free discipline
    // (the model is vocabulary-sized, so the staged ln never runs on
    // corpus rows)
    val modelLp = graft.functions.LnExact.withLp6(
      model.crossJoin(total),
      col("c").cast("double") / col("t"), "lp6")
      .select("tok", "lp6")
    val scored = toks.join(modelLp, "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tok"),
        round(sum(col("lp6")).cast("double") / 1000000.0 / count(lit(1)), 6)
          .as("mean_logp"))
      // sever lineage BEFORE the state write: the returned frame must
      // not re-derive its model against a state dir that now already
      // contains this batch's counts
      .localCheckpoint(true)
    batchCounts.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    scored
  }

  /** File-stream wrapper: one staged file per micro-batch, scored rows
    * landed under `outDir/batch=<id>` (idempotent on replay), token
    * counts accumulated per-batch in `stateDir`.
    */
  def scoreStream(
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
          scoreBatch(batch.sparkSession, batch, stateDir, batchId)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
