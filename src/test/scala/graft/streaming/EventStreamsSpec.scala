package graft.streaming

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The streaming twins must produce the batch answers: run the event log
  * through the streaming operators with `Trigger.AvailableNow` + memory
  * sink and diff against the equivalent batch aggregation.
  */
class EventStreamsSpec extends SparkSpec {

  private def eventsBatch = graft.Tables(spark, TestSpark.Sf0001, "events")

  /** The testdata parquet carries nano timestamps readable only via the
    * nanosAsLong conf; stage a micro-converted copy for the file stream.
    */
  private lazy val stagedDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    eventsBatch.write.mode("overwrite").parquet(dir)
    dir
  }

  private def runStream(out: String)(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val stream = spark.readStream
      .schema(eventsBatch.schema)
      .parquet(stagedDir)
    build(stream).writeStream
      .format("memory")
      .queryName(out)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    spark.table(out)
  }

  test("streaming hourly aggregation equals the batch ev1 answer") {
    val streamed = runStream("hourly_out")(EventStreams.hourlyAgg(_))
    val batch = eventsBatch
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0)
          .as("total_value"))
    assert(rowSet(streamed) === rowSet(batch))
  }

  test("streaming session windows equal the batch gap-sessionization") {
    val streamed = runStream("sessions_out")(EventStreams.sessionize(_))
    // batch twin: ev2's lag/running-sum sessions, reduced to the same
    // (user, session_start, n_events) shape
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val gapped = eventsBatch
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000 * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
    val batch = gapped.groupBy("user_id", "session_id")
      .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "n_events")
    assert(rowSet(streamed) === rowSet(batch))
  }
}
