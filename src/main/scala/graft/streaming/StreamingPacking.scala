package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental sequence packing: the streaming face of `Packing.pk1`.
  * Each arriving document batch is packed into fixed-`budget` token
  * sequences CONTINUING from where the shard left off — state is one
  * (source, next_off) row per shard, far smaller than the corpus — so
  * a trainer can consume an ever-growing packed corpus whose earlier
  * spans never change (append-only, the property a data loader needs).
  *
  * Per batch: one window prefix-sum per shard over the NEW docs plus a
  * broadcast-size join against the offset state. Documents are packed
  * in arrival order within a batch (doc_id as the deterministic
  * tiebreaker); like every per-shard packer, sequences never span
  * shards.
  */
object StreamingPacking {

  private val Budget = 512L

  private def stateExists(spark: SparkSession, stateDir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(stateDir)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Pack one batch against the offset state; returns the new span rows
    * that were appended to `spansDir`.
    */
  def packBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
      spansDir: String): DataFrame = {
    val toks = batch.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val base =
      if (stateExists(spark, stateDir)) {
        spark.read.parquet(stateDir)
          .groupBy("source").agg(max("next_off").as("base_off"))
      } else {
        toks.select(col("source")).distinct().withColumn("base_off", lit(0L))
      }
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = toks
      .join(base, Seq("source"), "left")
      .withColumn("base_off", coalesce(col("base_off"), lit(0L)))
      .withColumn("start_off",
        col("base_off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(
          expr(s"start_off DIV $Budget"),
          expr(s"(start_off + n_tokens - 1) DIV $Budget"))))
      .select(
        col("source"),
        col("seq_id"),
        col("doc_id"),
        greatest(col("seq_id") * Budget - col("start_off"), lit(0L))
          .as("doc_start"),
        (least((col("seq_id") + 1) * Budget, col("start_off") + col("n_tokens")) -
          greatest(col("seq_id") * Budget, col("start_off"))).as("span_len"),
        (greatest(col("start_off"), col("seq_id") * Budget) -
          col("seq_id") * Budget).as("seq_start"))
      .localCheckpoint(true) // sever lineage before state is advanced
    spans.write.mode("append").parquet(spansDir)

    // advance the per-shard high-water mark: old base + batch token sum
    val nextState = toks.groupBy("source").agg(sum("n_tokens").as("batch_tokens"))
      .join(base, Seq("source"), "left")
      .select(col("source"),
        (coalesce(col("base_off"), lit(0L)) + col("batch_tokens")).as("next_off"))
      .localCheckpoint(true)
    nextState.write.mode("append").parquet(stateDir)
    spans
  }

  /** Always-on variant: stream a landing directory of document parquet
    * files into the packed-span store. `maxFilesPerTrigger` bounds each
    * micro-batch (the backpressure knob a production ingest sets so one
    * bulk landing doesn't become one giant batch).
    */
  def packStream(
      spark: SparkSession,
      landingDir: String,
      schema: org.apache.spark.sql.types.StructType,
      stateDir: String,
      spansDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.streaming.StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader
      .parquet(landingDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        packBatch(batch.sparkSession, batch, stateDir, spansDir): Unit
      }
      .start()
  }
}
