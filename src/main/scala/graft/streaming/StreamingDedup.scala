package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental exact dedup: the streaming face of `Dedup.dd1`. New
  * document batches are fingerprinted (md5 of content — the same key
  * dd1 groups by), deduped within the batch, anti-joined against the
  * persistent fingerprint state, and only first-seen documents are
  * appended to the canonical store.
  *
  * This is the operational shape content dedup takes at 100 TB: the
  * state table holds one (fingerprint, doc_id) row per unique document
  * ever seen — far smaller than the corpus — and each micro-batch does
  * one broadcast-or-shuffle anti-join against it instead of any
  * recomputation over history. Batch-internal duplicates are resolved
  * min-doc_id-first, matching dd1's keep-smallest rule.
  */
object StreamingDedup {

  /** Dedup one batch against the state dir; returns the new canonical
    * rows that were appended. Idempotent per unique content.
    */
  def dedupBatch(spark: SparkSession, batch: DataFrame, stateDir: String): DataFrame = {
    val fingerprinted = batch
      .withColumn("fingerprint", md5(col("text")))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("doc_id"), min(col("text")).as("text"))
    val fresh =
      if (new java.io.File(stateDir).exists()) {
        val seen = spark.read.parquet(stateDir).select("fingerprint")
        fingerprinted.join(seen, Seq("fingerprint"), "left_anti")
      } else fingerprinted
    // sever lineage BEFORE appending: the returned frame must not
    // re-evaluate its anti-join against a state dir that now already
    // contains this batch's rows
    val materialized = fresh.localCheckpoint(true)
    materialized.write.mode("append").parquet(stateDir)
    materialized
  }

  /** Always-on variant: stream a landing directory of document parquet
    * files into the canonical store with exactly-once-per-file semantics.
    */
  def dedupStream(
      spark: SparkSession,
      landingDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        dedupBatch(batch.sparkSession, batch, stateDir): Unit
      }
      .start()
}
