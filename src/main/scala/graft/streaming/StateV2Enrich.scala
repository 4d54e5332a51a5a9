package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery, TTLConfig, TimeMode, TimerValues, Trigger, ValueState}
import org.apache.spark.sql.types.StructType

/** Per-user running enrichment on the ARBITRARY STATE API v2
  * (`transformWithState` + `StatefulProcessor`) — the third point on
  * the engine's streaming-state spectrum: sm3 manages its own parquet
  * state, sm17 uses classic `flatMapGroupsWithState`, and this is the
  * v2 operator a current production deployment reaches for first —
  * named typed state handles (`ValueState`), explicit TimeMode/TTL,
  * and the RocksDB provider REQUIRED by the API (incremental state
  * snapshots, the 100 TB configuration).
  *
  * Semantics: every event is emitted enriched with its per-user
  * sequence number and running fixed-point value sum. Rows within a
  * micro-batch arrive unordered, so the handler sorts its group's
  * batch slice by (ts, event_id) before folding — at scale each
  * (user, batch) slice is small by construction; ACROSS batches the
  * ordering is the replay's (the state carries the fold). With an
  * event-time-ordered drain the output equals the batch window
  * computation row for row, which is sm23's oracle.
  */
object StateV2Enrich {

  final case class EvIn(user_id: Long, event_id: Long, ts_us: Long, v_fx: Long)
  final case class EvOut(event_id: Long, user_id: Long, seq: Long, cum_fx: Long)
  final case class Agg(n: Long, cum: Long)

  /** Running (count, sum) per user in a named ValueState handle. */
  final class RunningStats extends StatefulProcessor[Long, EvIn, EvOut] {
    @transient private var agg: ValueState[Agg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[Agg](
        "agg", Encoders.product[Agg], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvIn],
        timerValues: TimerValues): Iterator[EvOut] = {
      val sorted = rows.toArray.sortBy(r => (r.ts_us, r.event_id))
      var st = if (agg.exists()) agg.get() else Agg(0L, 0L)
      val out = sorted.map { r =>
        st = Agg(st.n + 1, st.cum + r.v_fx)
        EvOut(r.event_id, key, st.n, st.cum)
      }
      agg.update(st)
      out.iterator
    }
  }

  /** Stream `landingDir`'s event files into an enriched parquet sink —
    * state, offsets, and sink commits ride one checkpoint.
    */
  def enrichStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landingDir)
      .select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 10000).cast("long").as("v_fx"))
      .as[EvIn]
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningStats, TimeMode.None(), OutputMode.Append())
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Run [[enrichStream]] to drain under the RocksDB provider (the v2
    * state API requires it), restoring the previous provider after.
    */
  def enrichStreamRocksDb(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try enrichStream(spark, landingDir, schema, outDir, checkpointDir)
      .awaitTermination()
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
