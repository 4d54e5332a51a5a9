package graft.streaming

import graft.{Q, Tables}
import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Driver-verified faces of the streaming tier: each registry entry runs
  * a REAL Structured Streaming query (file source → checkpointed
  * micro-batches → sink) to completion under `Trigger.AvailableNow`,
  * then returns the materialized result table — deterministic, so the
  * same DuckDB oracle that checks the batch twin checks the streaming
  * runtime end-to-end. This closes the gap between "spec-asserted
  * batch-equivalence" and "a green CORRECTNESS row": the rows the driver
  * hashes here came out of the streaming engine, not the batch planner.
  *
  * Reference anchor: the event-driven incremental load path
  * (`bigquery_loader_function/main.py:36-45`, `README.md:317-328`) —
  * files land, a trigger fires, state advances; AvailableNow is that
  * exact lifecycle run to drain.
  *
  * Scale shape: identical to the wrapped operators' (StreamingPacking
  * packs per shard with O(shards) state; the hourly rollup is a
  * windowed streaming aggregation whose state is O(open windows ×
  * event types)). The temp-dir staging below is test plumbing, not the
  * operator — a production deployment points the same code at its
  * landing bucket. `bench = false`: wall-clock here is streaming-runtime
  * fixed overhead (micro-batch scheduling, checkpoint I/O), not a
  * data-scale signal.
  */
object StreamingQueries {

  /** Stage `df` into `landing` as `chunks` single-file parquets split by
    * ascending `orderCol` ranges, with strictly increasing mtimes so the
    * file stream source (which orders by modification time) replays them
    * as distinct micro-batches in `orderCol` order under
    * maxFilesPerTrigger=1 — a real multi-batch run, not one bulk batch.
    */
  private def stageOrderedChunks(
      df: DataFrame, orderCol: String, bounds: Seq[Long], landing: Path): Unit = {
    val ranges = (Long.MinValue +: bounds).zip(bounds :+ Long.MaxValue)
    ranges.zipWithIndex.foreach { case ((lo, hi), i) =>
      val tmp = Files.createTempDirectory(s"graft_chunk_$i")
      df.filter(col(orderCol) >= lo && col(orderCol) < hi)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = landing.resolve(f"chunk-$i%03d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + i * 60000L))
    }
  }

  private def tempDirs(prefix: String): (Path, Path, Path, Path) = {
    val root = Files.createTempDirectory(prefix)
    (Files.createDirectories(root.resolve("landing")),
      root.resolve("state"), root.resolve("spans"),
      root.resolve("checkpoint"))
  }

  val all: Seq[Q] = Seq(
    // SM1: StreamingPacking's AvailableNow wrapper run to completion over
    // a three-file landing replay (maxFilesPerTrigger=1 → three real
    // micro-batches, offsets carried across batches through the
    // (source, next_off) state store), then the packed-span table read
    // back. The oracle is pk1's SQL VERBATIM: incremental packing of an
    // append-only, doc_id-ordered arrival stream must equal the one-shot
    // batch packing — the append-only contract a training data loader
    // depends on.
    Q(
      "sm1_stream_pack",
      (s, dir) => {
        val (landing, state, spans, ckpt) = tempDirs("graft_sm1")
        val docs = Tables(s, dir, "documents").select("source", "doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StreamingPacking.packStream(
          s, landing.toString, docs.schema, state.toString, spans.toString,
          ckpt.toString, maxFilesPerTrigger = Some(1))
          .awaitTermination()
        s.read.parquet(spans.toString)
          .select("source", "seq_id", "doc_id", "doc_start", "span_len", "seq_start")
          .orderBy("source", "seq_id", "doc_id")
      },
      // pk1's oracle, verbatim (Packing.scala keeps the commentary)
      Some("""WITH t AS (SELECT source, doc_id,
              |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              |          FROM documents),
              |o AS (SELECT source, doc_id, n_tokens,
              |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
              |      FROM t),
              |sp AS (SELECT source, doc_id, n_tokens, start_off,
              |         unnest(generate_series(start_off // 512,
              |                                (start_off + n_tokens - 1) // 512)) AS seq_id
              |       FROM o)
              |SELECT source, seq_id, doc_id,
              |  greatest(seq_id * 512 - start_off, 0) AS doc_start,
              |  least((seq_id + 1) * 512, start_off + n_tokens)
              |    - greatest(seq_id * 512, start_off) AS span_len,
              |  greatest(start_off, seq_id * 512) - seq_id * 512 AS seq_start
              |FROM sp ORDER BY source, seq_id, doc_id""".stripMargin),
      bench = false
    ),

    // SM2: the tumbling-window streaming aggregation (ev1's streaming
    // twin, readStream → groupBy(window(ts, 1 hour)) → complete-mode
    // sink) run to drain over a three-file replay of the events table.
    // Complete output mode because the run must emit EVERY window to be
    // oracle-comparable (append mode withholds windows the watermark
    // hasn't closed — under AvailableNow that would silently drop the
    // stream's tail hour). The oracle is ev1's SQL verbatim.
    Q(
      "sm2_stream_hourly",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm2")
        val ev = s.read.parquet(s"$dir/events.parquet")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val sinkName = s"graft_sm2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val raw = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        // events.ts is TIMESTAMP(NANOS) → LongType under nanosAsLong;
        // same micros truncation Tables() applies on the batch side
        val stream =
          (if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
          else raw)
            .groupBy(window(col("ts"), "1 hour"), col("event_type"))
            .agg(
              count(lit(1)).as("n"),
              (sum(round(col("value") * 10000).cast("long")).cast("double") / 10000.0)
                .as("total_value"))
        stream.writeStream
          .format("memory")
          .queryName(sinkName)
          .outputMode("complete")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .select(
            col("window.start").as("hour"), col("event_type"),
            col("n"), col("total_value"))
          .orderBy("hour", "event_type")
      },
      // ev1's oracle, verbatim (EventOps.scala keeps the commentary)
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             |  CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE)/10000.0 AS total_value
             |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
      bench = false
    )
  )
}
