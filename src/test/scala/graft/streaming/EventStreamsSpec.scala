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

  test("watermark drops events that arrive later than the lateness bound") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("late").toString
    val landing = s"$root/in"
    val chk = s"$root/chk"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))

    def drop(name: String, rows: Seq[(Long, String, java.sql.Timestamp, Double, String, Long)]): Unit =
      rows.toDF("event_id", "event_type", "ts", "value", "props", "user_id")
        .coalesce(1).write.mode("overwrite").parquet(s"$landing/$name")

    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-06-01 $h%02d:30:00")
    val schema = Seq((1L, "view", ts(1), 1.0, "{}", 1L))
      .toDF("event_id", "event_type", "ts", "value", "props", "user_id").schema

    val outDir = s"$root/out"
    def run(): Unit =
      spark.readStream.schema(schema).parquet(s"$landing/*")
        .transform(EventStreams.hourlyAgg(_, watermark = "1 hour"))
        .writeStream
        // append mode emits only FINALIZED (watermark-passed) windows;
        // foreachBatch+parquet persists them across restarts of the query
        .outputMode("append")
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir): Unit
        }
        .start().awaitTermination()

    // batch 1: events at 01:30 and 05:30 — watermark advances to 04:30,
    // finalizing (and emitting) the 01:00 window
    drop("b1", Seq(
      (1L, "view", ts(1), 1.0, "{}", 1L),
      (2L, "view", ts(5), 1.0, "{}", 1L)))
    run()
    // batch 2: a straggler for the already-finalized 01:00 window plus a
    // fresh event — the straggler is beyond the lateness bound and dropped
    drop("b2", Seq(
      (3L, "view", ts(1), 99.0, "{}", 1L),
      (4L, "view", ts(9), 1.0, "{}", 1L)))
    run()

    val out = spark.read.parquet(outDir)
    val w1 = out.filter("hour = timestamp'2024-06-01 01:00:00'").collect()
    assert(w1.length === 1, "01:00 window finalized exactly once")
    assert(w1.head.getAs[Long]("n") === 1, "the late straggler was dropped, not merged")
  }

  test("stream-stream interval join equals the batch range-join answer") {
    def side(t: String) = spark.readStream
      .schema(eventsBatch.schema).parquet(stagedDir)
      .filter(col("event_type") === t)
    EventStreams.nearbyPurchases(side("error"), side("purchase"))
      .writeStream
      .format("memory").queryName("ssjoin_out")
      .outputMode("append") // stream-stream joins emit in append mode
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination()
    val streamed = spark.table("ssjoin_out").select("error_id", "purchase_id")

    val e = eventsBatch.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("ets"))
    val p = eventsBatch.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
    val batch = e.join(p,
        abs(unix_micros(col("pts")) - unix_micros(col("ets"))) <= 300000000L)
      .select("error_id", "purchase_id")
    assert(streamed.count() > 0)
    assert(rowSet(streamed) === rowSet(batch))
  }

  test("typed mapGroupsWithState carries running per-user stats across batches") {
    val root = java.nio.file.Files.createTempDirectory("ustats").toString
    val landing = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))

    // split the event log into two halves on a deterministic predicate
    // (a twice-evaluated limit could disagree on ties) — state must
    // accumulate across the micro-batches
    val ev = eventsBatch
    val mid = ev.count() / 2
    ev.filter(col("event_id") < mid).write.mode("overwrite").parquet(s"$landing/h1")

    val outDir = s"$root/out"
    def run(): Unit =
      spark.readStream.schema(eventsBatch.schema).parquet(s"$landing/*")
        .transform(df => EventStreams.runningUserStats(df).toDF("user_id", "stats"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$root/chk")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(outDir): Unit
        }
        .start().awaitTermination()

    run()
    ev.filter(col("event_id") >= mid).write.mode("overwrite").parquet(s"$landing/h2")
    run()

    // last update per user must equal the batch totals over ALL events
    val got = spark.read.parquet(outDir)
      .select(col("user_id"), col("stats.n_events"), col("stats.n_purchases"))
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("n_purchases").as("n_purchases"))
    val want = eventsBatch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
    assert(rowSet(got) === rowSet(want))
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
