package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Incremental record linkage: the streaming face of `rl1` — link-as-
  * you-ingest. State holds every document's blocking projection
  * (doc_id, 80-char head, first-token block key); each arriving
  * micro-batch joins against state on the block key plus itself
  * (batch-internal pairs, id-ordered), scores candidates with the
  * native Jaro–Winkler expression, and appends matches exactly once.
  *
  * Unlike the scrub twin (sm15), the DRAINED output equals the batch
  * operator's full answer: every unordered pair meets exactly once —
  * batch-internal when both arrive together, cross-batch when the
  * later one arrives — so sm16's oracle is rl1's oracle VERBATIM.
  *
  * 100 TB shape: state is the blocking projection (~90 bytes/doc), not
  * the corpus; each batch's work is its own candidates only. The same
  * two spreads as rl1 apply per batch when batches are large; at this
  * micro-batch scale the joins stay broadcast.
  */
object StreamingLinkage {

  val Threshold = 0.9

  private def stateExists(spark: SparkSession, stateDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).nonEmpty
  }

  private def projected(batch: DataFrame): DataFrame =
    batch.select(
      col("doc_id"),
      substring(col("text"), 1, 80).as("head"),
      split(col("text"), " ").getItem(0).as("w1"))

  private def score(pairs: DataFrame): DataFrame =
    pairs
      .withColumn("sim", round(call_function(
        GraftFunctions.JaroWinklerName, col("head_a"), col("head_b")), 6))
      .filter(col("sim") >= Threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))

  /** Link one batch against the state dir; overwrites this batch's
    * state partition with its projections and returns the new match
    * pairs (canonical doc_a < doc_b).
    *
    * REPLAY-IDEMPOTENT (foreachBatch is at-least-once): state is keyed
    * by batchId and the read excludes the current id, so a crash after
    * the state write and a replay cannot join the batch against its own
    * projections — which would emit self-pairs (sim 1.0) and duplicate
    * cross pairs. The `sid =!= doc_id` guard is belt-and-braces for the
    * same failure shape.
    */
  def linkBatch(
      spark: SparkSession,
      batch: DataFrame,
      stateDir: String,
      batchId: Long): DataFrame = {
    GraftFunctions.register(spark)
    val d = projected(batch)
    // batch-internal: id-ordered pairs within the arriving batch
    val a = d.select(col("doc_id").as("doc_a"), col("head").as("head_a"), col("w1"))
    val b = d.select(col("doc_id").as("doc_b"), col("head").as("head_b"), col("w1"))
    val internal = a.join(b, a("w1") === b("w1") && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "head_a", "head_b")
    // cross-batch: every (state, new) block pair, canonicalized by id
    val candidates =
      if (stateExists(spark, stateDir)) {
        val st = spark.read.parquet(stateDir)
          .filter(col("batch") =!= batchId)
          .select(col("doc_id").as("sid"), col("head").as("shead"), col("w1"))
        val cross = st.join(d, "w1")
          .filter(col("sid") =!= col("doc_id"))
          .select(
            least(col("sid"), col("doc_id")).as("doc_a"),
            greatest(col("sid"), col("doc_id")).as("doc_b"),
            when(col("sid") < col("doc_id"), col("shead")).otherwise(col("head")).as("head_a"),
            when(col("sid") < col("doc_id"), col("head")).otherwise(col("shead")).as("head_b"))
        cross.unionByName(internal)
      } else internal
    // sever lineage BEFORE the state write: the returned frame must
    // not re-join a state dir that now already contains this batch
    val out = score(candidates).localCheckpoint(true)
    d.write.mode("overwrite").parquet(s"$stateDir/batch=$batchId")
    out
  }

  /** File-stream wrapper: one staged file per micro-batch; match pairs
    * land under `outDir/batch=<id>` (idempotent on replay), blocking
    * projections accumulate per-batch in `stateDir`.
    */
  def linkStream(
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
          linkBatch(batch.sparkSession, batch, stateDir, batchId)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()
}
