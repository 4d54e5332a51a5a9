package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twins of the batch event operators in
  * `graft.operators.EventOps` — the same logical aggregations run
  * incrementally with event-time watermarks (SURVEY.md §2.9's extension
  * path: the `interactions`/`events` log is the natural streaming table).
  *
  * Each function takes a streaming DataFrame (`spark.readStream...`) with
  * an event-time `ts` column and returns the transformed streaming frame;
  * sinks/triggers stay with the caller (tests drive them with
  * `Trigger.AvailableNow` + memory sink and assert equality with the
  * batch results).
  *
  * Scale notes: both aggregations are keyed state in Spark's state store;
  * the watermark bounds state size (old windows are evicted once the
  * watermark passes), which is what makes them runnable forever on an
  * unbounded stream. State is hash-partitioned on the grouping key — the
  * same shuffle the batch plan does, amortized across micro-batches.
  */
object EventStreams {

  /** Streaming twin of `ev1_hourly_agg`: tumbling 1-hour event-time
    * windows per event type, 1-hour lateness allowance.
    */
  def hourlyAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0)
          .as("total_value"))
      .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total_value"))

  /** Streaming twin of `ev2_sessionize`: 30-minute-gap session windows per
    * user via `session_window` — the built-in stateful session operator
    * (same gap semantics as the batch lag/running-sum formulation).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("w.start").as("session_start"),
        col("n_events"))
}
