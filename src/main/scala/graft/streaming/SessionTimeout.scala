package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types.StructType

/** EVENT-TIME session windows with timeout emission on the arbitrary
  * state API v2 — the timer half of `transformWithState` that sm23's
  * enrichment (TimeMode.None) leaves unexercised, and the half a 100 TB
  * stream actually relies on to BOUND its state: a session closes
  * either when a later event of the same user exceeds the gap
  * (input-driven closure) or when the WATERMARK passes the session's
  * `end + gap` with no such event (timer-driven closure via
  * `registerTimer`/`handleExpiredTimer`), after which the key's state
  * is cleared. Without timers, the last session of every idle user
  * would sit in the store forever.
  *
  * Determinism contract (what lets sm24 carry a batch oracle): the
  * replay is event-time-ordered, closure uses exact integer micros
  * (`gap exceeded` iff `ts_us - end_us > gapUs`), and a timer only
  * triggers EMISSION — by the time the watermark passes `end + gap`,
  * any still-unseen event is beyond the gap and would have opened a
  * new session anyway, so timer-vs-input closure order cannot change
  * the session set. The emitted sessions equal DuckDB's lag/running-sum
  * sessionization of the same table, row for row.
  */
object SessionTimeout {

  final case class SessIn(user_id: Long, event_id: Long, ts_us: Long, v_fx: Long)
  final case class SessAgg(start_us: Long, end_us: Long, n: Long,
      sum_fx: Long, expiry_ms: Long)
  final case class SessOut(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_fx: Long)

  /** Per-user open session in a named ValueState; one armed event-time
    * timer per key (re-armed on every extension, the previous one
    * deleted).
    */
  final class Sessionize(gapUs: Long) extends StatefulProcessor[Long, SessIn, SessOut] {
    @transient private var sess: ValueState[SessAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sess = getHandle.getValueState[SessAgg](
        "sess", Encoders.product[SessAgg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessIn],
        timerValues: TimerValues): Iterator[SessOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      if (sorted.isEmpty) return Iterator.empty
      val out = scala.collection.mutable.ArrayBuffer.empty[SessOut]
      var st =
        if (sess.exists()) {
          val prev = sess.get()
          getHandle.deleteTimer(prev.expiry_ms)
          Some(prev)
        } else None
      sorted.foreach { r =>
        st match {
          case Some(s) if r.ts_us - s.end_us > gapUs =>
            out += SessOut(key, s.start_us, s.end_us, s.n, s.sum_fx)
            st = Some(SessAgg(r.ts_us, r.ts_us, 1L, r.v_fx, 0L))
          case Some(s) =>
            // min/max, NOT assignment: a late-but-within-watermark
            // event (files replayed out of time order across
            // micro-batches) may carry ts_us < s.end_us, and letting
            // it regress the window would wrongly split the session
            // at the next on-time event
            st = Some(SessAgg(math.min(s.start_us, r.ts_us),
              math.max(s.end_us, r.ts_us), s.n + 1, s.sum_fx + r.v_fx, 0L))
          case None =>
            st = Some(SessAgg(r.ts_us, r.ts_us, 1L, r.v_fx, 0L))
        }
      }
      // arm the timeout for the (possibly extended) open session: ceil
      // to ms so the timer can never fire before end + gap
      val s = st.get
      val expiryMs = (s.end_us + gapUs + 999L) / 1000L
      getHandle.registerTimer(expiryMs)
      sess.update(s.copy(expiry_ms = expiryMs))
      out.iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] = {
      if (!sess.exists()) return Iterator.empty
      val s = sess.get()
      // only the ARMED timer closes the session — a stale one (deleted
      // edge cases, replay) must not flush a still-open session
      if (expiredTimerInfo.getExpiryTimeInMs != s.expiry_ms) Iterator.empty
      else {
        sess.clear()
        Iterator.single(SessOut(key, s.start_us, s.end_us, s.n, s.sum_fx))
      }
    }
  }

  /** Stream `landingDir`'s event files into a sessions parquet sink —
    * event-time mode, watermarked, RocksDB provider (required by the
    * v2 API). Negative user_ids are reserved for watermark-advancing
    * sentinels and never emit (their sessions stay open by design).
    */
  def sessionStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      gapUs: Long,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .withWatermark("ts", "10 minutes")
      .select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 10000).cast("long").as("v_fx"))
      .as[SessIn]
      .groupByKey(_.user_id)
      .transformWithState(
        new Sessionize(gapUs), TimeMode.EventTime(), OutputMode.Append())
      .filter(col("user_id") >= 0)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run [[sessionStream]] to drain under the RocksDB provider. */
  def sessionStreamRocksDb(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      gapUs: Long,
      outDir: String,
      checkpointDir: String): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try sessionStream(spark, landingDir, schema, gapUs, outDir, checkpointDir)
      .awaitTermination()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
