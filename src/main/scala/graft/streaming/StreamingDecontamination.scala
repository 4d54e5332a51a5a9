package graft.streaming

import graft.operators.Decontamination
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous decontamination: the streaming face of `Decontamination`
  * (dc1/dc2), built on a STREAM-STATIC join — the Structured Streaming
  * pattern for probing an immutable reference table from a live feed.
  *
  * The train-gram index is batch-built once
  * ([[Decontamination.trainGramIndex]]) and joined as the static side;
  * each arriving document explodes into its native-hashed 5-grams and a
  * left-semi join flags any doc sharing a gram with train. Unlike the
  * `foreachBatch` dedup twins (whose state GROWS with accepted docs),
  * the static side here is fixed, so Spark plans the same
  * broadcast-or-shuffle join per micro-batch with zero streaming state
  * for the join itself; only `dropDuplicates` keeps a doc_id set so a
  * document spread across multiple input files is flagged once. In
  * production that dedup state is bounded with a `withWatermark` on an
  * arrival-time column; the test harness runs Trigger.AvailableNow where
  * the run is finite.
  */
object StreamingDecontamination {

  /** Pure transform: works identically on a batch or streaming frame of
    * (doc_id, text) — the streaming unit test and any batch backfill
    * share this exact plan.
    */
  def contaminatedDocs(docs: DataFrame, trainGrams: DataFrame): DataFrame =
    Decontamination
      .gramsOf(docs)
      .join(trainGrams.select(col("g")), Seq("g"), "left_semi")
      .select(col("doc_id"))
      .dropDuplicates("doc_id")

  /** Always-on variant: stream a landing directory of document parquet
    * drops, appending flagged doc_ids to `outDir` exactly once per file.
    */
  def flagStream(
      landingDir: String,
      schema: StructType,
      trainGrams: DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    val spark = trainGrams.sparkSession
    val stream = spark.readStream.schema(schema).parquet(landingDir)
    contaminatedDocs(stream, trainGrams).writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
