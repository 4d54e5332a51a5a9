package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

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

  /** Running per-user engagement state carried in the typed state store
    * (`KeyValueGroupedDataset.mapGroupsWithState`): cumulative event
    * count, purchase count, and peak value. Custom per-key state the
    * built-in aggregations don't express — the reference-world "user
    * engagement profile" kept incrementally current.
    *
    * State per key is one `UserStats` (three numbers): bounded,
    * partition-local, updated per micro-batch with no reprocessing of
    * history.
    */
  /** STREAM-STREAM interval join — the streaming twin of the batch
    * `rj1_range_join_binned`: pair every error with the purchases that
    * happen within ±5 minutes of it, both sides live. Spark rejects
    * stream-stream joins with no equality predicate (state would be a
    * cross product), so the same time-bin key that fixes the batch plan
    * serves here: purchases explode into their 3 adjacent 5-minute bins
    * and the join is EQUI on the bin with the exact range as residual —
    * at most one bin copy matches a given error, so no dedup is needed.
    * The watermarks + the event-time range in the condition bound the
    * join state: each side buffers only rows younger than
    * watermark + window, evicted as the watermark advances — the
    * property that lets the join run forever. State is hash-partitioned
    * on the bin key like any shuffle.
    */
  def nearbyPurchases(
      errors: DataFrame,
      purchases: DataFrame,
      watermark: String = "10 minutes"): DataFrame = {
    val winUs = 300000000L // 5 minutes
    val e = errors
      .select(col("event_id").as("error_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", watermark)
      .withColumn("bin", expr(s"unix_micros(error_ts) DIV $winUs"))
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
      .withColumn("bin", explode(array(
        expr(s"unix_micros(purchase_ts) DIV $winUs - 1"),
        expr(s"unix_micros(purchase_ts) DIV $winUs"),
        expr(s"unix_micros(purchase_ts) DIV $winUs + 1"))))
    e.join(
        p,
        e("bin") === p("bin") &&
          expr("purchase_ts BETWEEN error_ts - INTERVAL 5 MINUTES AND error_ts + INTERVAL 5 MINUTES"))
      .drop("bin")
  }

  final case class UserStats(n_events: Long, n_purchases: Long, peak_value: Double)

  def runningUserStats(events: DataFrame): Dataset[(Long, UserStats)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_type"), col("value"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserStats, (Long, UserStats)] {
        (user: Long, rows: Iterator[(Long, String, Double)], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(0L, 0L, Double.MinValue))
          val next = rows.foldLeft(prev) { case (acc, (_, typ, v)) =>
            UserStats(
              acc.n_events + 1,
              acc.n_purchases + (if (typ == "purchase") 1 else 0),
              math.max(acc.peak_value, v))
          }
          state.update(next)
          user -> next
      }
  }
}
