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
    stageBatches(
      ranges.map { case (lo, hi) =>
        df.filter(col(orderCol) >= lo && col(orderCol) < hi)
      }, landing)
  }

  /** Stage heterogeneous batch DataFrames (CDC-style: each batch is its
    * own content, not a key range of one frame) as single-file parquets
    * with strictly increasing mtimes, so the file stream source replays
    * them as distinct micro-batches in sequence order.
    */
  private def stageBatches(dfs: Seq[DataFrame], landing: Path): Unit =
    dfs.zipWithIndex.foreach { case (df, i) =>
      val tmp = graft.TempDirs.create(s"graft_batch_$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().get()
        finally listing.close()
      val dest = landing.resolve(f"batch-$i%03d.parquet")
      Files.move(part, dest)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000000000L + i * 60000L))
    }

  private def tempDirs(prefix: String): (Path, Path, Path, Path) = {
    val root = graft.TempDirs.create(prefix)
    (Files.createDirectories(root.resolve("landing")),
      root.resolve("state"), root.resolve("spans"),
      root.resolve("checkpoint"))
  }

  /** Stage one header'd CSV file version into `backups` with an explicit
    * mtime (versions replay in mtime order, like object-store events).
    */
  private def stageCsvVersion(
      df: DataFrame, backups: Path, name: String, mtimeMs: Long): Unit = {
    val tmp = graft.TempDirs.create(s"graft_csv_$name")
    df.coalesce(1).write.mode("overwrite").option("header", true).csv(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".csv"))
      .findFirst().get()
    val dest = backups.resolve(name)
    Files.move(part, dest)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtimeMs))
  }

  private def splitDocs(s: SparkSession, dir: String, split: String) =
    graft.operators.Sampling
      .hashSplit(Tables(s, dir, "documents").select(col("doc_id"), col("text")),
        col("doc_id"))
      .filter(col("split") === split)
      .select("doc_id", "text")

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
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val sinkName = s"graft_sm2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val raw = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        // ts arrives already normalized to TimestampType by Tables();
        // the staged landing chunks carry that schema, so the stream
        // needs no further conversion.
        val stream = raw
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
    ),

    // SM3: StreamingDedup's exact-dedup wrapper run to drain over the
    // same ordered three-file replay: per batch, fingerprint → in-batch
    // min-doc_id dedup → anti-join against the persistent fingerprint
    // state → append survivors. The final state table must equal dd1's
    // batch answer (first-arriving doc per content = global min doc_id,
    // because the replay is doc_id-ordered across batches) — the
    // incremental-equals-batch contract that makes the streaming form
    // safe to deploy.
    Q(
      "sm3_stream_dedup",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm3")
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StreamingDedup.dedupStream(
          s, landing.toString, docs.schema, state.toString, ckpt.toString)
          .awaitTermination()
        s.read.parquet(state.toString)
          .select("doc_id", "text")
          .orderBy("doc_id")
      },
      Some("""SELECT min(doc_id) AS doc_id, min(text) AS text
             |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM17: exact dedup on the ENGINE's state store (flatMapGroupsWithState
    // + RocksDB provider) — the same three-batch replay and the same dd1
    // oracle as sm3, but the fingerprint state lives inside the
    // streaming engine's checkpointed per-key store instead of an
    // operator-managed parquet table. Proves the built-in state path a
    // production 100 TB stream would use, alongside the parquet-state
    // design.
    Q(
      "sm17_statestore_dedup",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm17")
        val out = graft.TempDirs.create("graft_sm17_out").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StateStoreDedup.dedupStreamRocksDb(
          s, landing.toString, docs.schema, out, ckpt.toString)
        s.read.parquet(out)
          .select("doc_id", "text")
          .orderBy("doc_id")
      },
      // sm3's (= dd1's) oracle, verbatim
      Some("""SELECT min(doc_id) AS doc_id, min(text) AS text
             |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM18: score-as-you-ingest unigram quality scoring (tx14's
    // operational twin): three replayed micro-batches, each document
    // scored under the unigram model accumulated through its OWN batch
    // — prefix-consistent like sm15, and the oracle replays the
    // cumulative-counts-through-own-batch rule with the same fixed-
    // point integer mean.
    Q(
      "sm18_stream_scoring",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm18")
        val out = graft.TempDirs.create("graft_sm18_out").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StreamingScoring.scoreStream(
          s, landing.toString, docs.schema, state.toString, out, ckpt.toString)
          .awaitTermination()
        s.read.parquet(out)
          .select("doc_id", "n_tok", "mean_logp")
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text,
             |            CASE WHEN doc_id < 170 THEN 1
             |                 WHEN doc_id < 340 THEN 2 ELSE 3 END AS b
             |          FROM documents),
             |tk AS (SELECT doc_id, b, tok FROM (
             |         SELECT doc_id, b, unnest(string_split(text, ' ')) AS tok FROM d)
             |       WHERE tok <> ''),
             |cnt AS (SELECT tok, b, count(*) AS n FROM tk GROUP BY tok, b),
             |cum AS (SELECT tok, b, SUM(n) OVER (PARTITION BY tok ORDER BY b) AS c FROM cnt),
             |tot AS (SELECT b, SUM(nb) OVER (ORDER BY b) AS t
             |        FROM (SELECT b, count(*) AS nb FROM tk GROUP BY b)),
             |ml AS (SELECT cum.tok, cum.b,
             |  ${graft.functions.LnExact.duckLp6Cols("(CAST(cum.c AS DOUBLE) / tot.t)", "lp6")}
             |       FROM cum JOIN tot ON tot.b = cum.b),
             |sc AS (SELECT tk.doc_id,
             |         CAST(count(*) AS BIGINT) AS n_tok,
             |         ROUND(CAST(SUM(lp6) AS DOUBLE)
             |           / 1000000.0 / count(*), 6) AS mean_logp
             |       FROM tk JOIN ml ON ml.tok = tk.tok AND ml.b = tk.b
             |       GROUP BY tk.doc_id)
             |SELECT doc_id, n_tok, mean_logp FROM sc ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM19: streaming sketch maintenance — ap3's rollup as production
    // runs it: each micro-batch writes its per-day HLL sketches to a
    // batchId-keyed state dir (overwrite per id = replay-idempotent at
    // the FILE level, and HLL union is idempotent at the MERGE level —
    // re-unioning a replayed batch's sketch is a no-op on the
    // registers, a double safety the counting states sm15/sm16 need
    // prefix bookkeeping for). The month answer merges state sketches
    // without rescanning raw events; the oracle is ap3's verbatim (the
    // exact branch is oracle scaffolding, as there).
    Q(
      "sm19_stream_sketch",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm19")
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val raw = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        raw.writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch
              .groupBy(date_trunc("DAY", col("ts")).as("day"))
              .agg(hll_sketch_agg(col("user_id")).as("sk"))
              .write.mode("overwrite")
              .parquet(s"$state/batch=$batchId")
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        val monthly = s.read.parquet(state.toString)
          .groupBy(date_trunc("MONTH", col("day")).as("month"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
        val exact = ev
          .groupBy(date_trunc("MONTH", col("ts")).as("month"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
        exact.join(monthly, "month")
          .select(
            col("month").cast("date").as("month"),
            col("exact_users"),
            floor(abs(col("approx_users").cast("double") - col("exact_users")) /
              col("exact_users") / 0.25).cast("int").as("approx_err_band"))
          .orderBy("month")
      },
      Some("""SELECT CAST(date_trunc('month', ts) AS DATE) AS month,
             |  count(DISTINCT user_id) AS exact_users,
             |  CAST(0 AS INT) AS approx_err_band
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = false
    ),

    // SM15: the streaming exact-substring scrub (dd10's operational
    // twin): three replayed micro-batches, each scrubbed against the
    // grams seen so far (persistent gram-count state + the batch's own
    // grams), cleaned docs appended exactly once. PREFIX-CONSISTENT
    // like sm3 — a doc emitted in batch 1 is not re-scrubbed when
    // batch 3 duplicates one of its grams — and the oracle replays
    // that: an occurrence is covered iff its gram's cumulative count
    // through its OWN batch reaches 2.
    Q(
      "sm15_stream_scrub",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm15")
        val out = graft.TempDirs.create("graft_sm15_out").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StreamingScrub.scrubStream(
          s, landing.toString, docs.schema, state.toString, out, ckpt.toString)
          .awaitTermination()
        s.read.parquet(out)
          .select("doc_id", "n_tokens", "n_removed", "clean_text")
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
             |            CASE WHEN doc_id < 170 THEN 1
             |                 WHEN doc_id < 340 THEN 2 ELSE 3 END AS b
             |          FROM documents),
             |g AS (SELECT doc_id, b, i,
             |        CAST('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 15) AS BIGINT) AS gram
             |      FROM d, unnest(generate_series(1, greatest(len(toks) - 7, 0))) AS t(i)),
             |cnt AS (SELECT gram, b, count(*) AS n FROM g GROUP BY gram, b),
             |cum AS (SELECT gram, b, SUM(n) OVER (PARTITION BY gram ORDER BY b) AS c FROM cnt),
             |dupb AS (SELECT gram, b FROM cum WHERE c >= 2),
             |covered AS (
             |  SELECT DISTINCT g.doc_id, g.i + k.k AS pos
             |  FROM g JOIN dupb ON dupb.gram = g.gram AND dupb.b = g.b,
             |       unnest(generate_series(0, 7)) AS k(k)),
             |toks AS (SELECT doc_id, i AS pos, toks[i] AS tok
             |         FROM d, unnest(generate_series(1, len(toks))) AS t(i)),
             |kept AS (SELECT tk.* FROM toks tk LEFT JOIN covered c
             |           ON c.doc_id = tk.doc_id AND c.pos = tk.pos
             |         WHERE c.pos IS NULL),
             |reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |               string_agg(tok, ' ' ORDER BY pos) AS clean_text
             |        FROM kept GROUP BY doc_id)
             |SELECT d.doc_id, CAST(len(d.toks) AS INT) AS n_tokens,
             |       CAST(len(d.toks) - coalesce(r.n_kept, 0) AS BIGINT) AS n_removed,
             |       coalesce(r.clean_text, '') AS clean_text
             |FROM d LEFT JOIN reb r USING (doc_id)
             |ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM16: streaming record linkage (rl1's operational twin). The
    // drained output EQUALS the batch operator's answer — every
    // unordered pair meets exactly once (batch-internal when both
    // arrive together, cross-batch when the later one arrives) — so
    // the oracle is rl1's SQL verbatim.
    Q(
      "sm16_stream_linkage",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm16")
        val out = graft.TempDirs.create("graft_sm16_out").toString
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        StreamingLinkage.linkStream(
          s, landing.toString, docs.schema, state.toString, out, ckpt.toString)
          .awaitTermination()
        s.read.parquet(out)
          .select("doc_a", "doc_b", "sim")
          .orderBy("doc_a", "doc_b")
      },
      // rl1's oracle, verbatim (RecordLinkage.scala keeps the commentary)
      Some("""WITH d AS (SELECT doc_id, substr(text,1,80) AS head,
             |                  split_part(text,' ',1) AS w1 FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       ROUND(jaro_winkler_similarity(a.head, b.head), 6) AS sim
             |FROM d a JOIN d b ON a.w1 = b.w1 AND a.doc_id < b.doc_id
             |WHERE ROUND(jaro_winkler_similarity(a.head, b.head), 6) >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin),
      bench = false
    ),

    // SM4: StreamingDecontamination's STREAM-STATIC semi join run to
    // drain: the batch-built train-gram index is the static side, the
    // test split replays as a stream, flagged doc_ids land in parquet
    // exactly once. Oracle = dc1/dc2's dirty set (the same gram CTE).
    Q(
      "sm4_stream_decontam",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm4")
        val out = graft.TempDirs.create("graft_sm4_out").toString
        val test = splitDocs(s, dir, "test")
        stageOrderedChunks(test, "doc_id", Seq(250L), landing)
        val trainGrams = graft.operators.Decontamination.trainGramIndex(s, dir)
        StreamingDecontamination.flagStream(
          landing.toString, test.schema, trainGrams, out, ckpt.toString)
          .awaitTermination()
        s.read.parquet(out).select("doc_id").orderBy("doc_id")
      },
      Some(s"""WITH ${graft.operators.Decontamination.gramCte}
              |SELECT DISTINCT doc_id FROM te SEMI JOIN tr ON te.g = tr.g
              |ORDER BY doc_id""".stripMargin),
      bench = false
    ),

    // SM5: the STREAM-STREAM interval join (EventStreams.nearbyPurchases)
    // run to drain: errors and purchases are two live file streams, the
    // join key is the 5-minute time bin (stream-stream joins REQUIRE an
    // equality predicate; the exact ±5 min range rides as residual), and
    // the watermarks bound the state store. The emitted pair set must
    // equal the batch interval join the rj1/rj2/rj3 oracles compute.
    Q(
      "sm5_stream_interval_join",
      (s, dir) => {
        val root = graft.TempDirs.create("graft_sm5")
        val eLanding = Files.createDirectories(root.resolve("errors"))
        val pLanding = Files.createDirectories(root.resolve("purchases"))
        val ev = Tables(s, dir, "events")
          .select("event_id", "ts", "event_type")
        stageOrderedChunks(
          ev.filter(col("event_type") === "error"), "event_id", Nil, eLanding)
        stageOrderedChunks(
          ev.filter(col("event_type") === "purchase"), "event_id", Nil, pLanding)
        val schema = s.read.parquet(eLanding.toString).schema
        val joined = EventStreams.nearbyPurchases(
          s.readStream.schema(schema).parquet(eLanding.toString),
          s.readStream.schema(schema).parquet(pLanding.toString))
        val sinkName = s"graft_sm5_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        joined.writeStream
          .format("memory")
          .queryName(sinkName)
          .option("checkpointLocation", root.resolve("checkpoint").toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .select(col("error_id"), col("purchase_id"))
          .orderBy("error_id", "purchase_id")
      },
      Some("""WITH e AS (SELECT event_id AS error_id, epoch_us(ts) AS eus FROM events WHERE event_type = 'error'),
             |p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS pus FROM events WHERE event_type = 'purchase')
             |SELECT error_id, purchase_id FROM e JOIN p ON abs(pus - eus) <= 300000000
             |ORDER BY error_id, purchase_id""".stripMargin),
      bench = false
    ),

    // SM6: the event-driven WRITE_TRUNCATE warehouse load (the
    // reference's GCS→BigQuery loader contract, IncrementalLoad) run to
    // drain over TWO file versions of one table landing in mtime order:
    // a stale half-table CSV, then the full CSV. maxFilesPerTrigger=1
    // makes each version its own load event; every event replaces the
    // warehouse table wholesale, so the final table must equal the LAST
    // version — the last-write-wins semantics the reference's
    // write_disposition=WRITE_TRUNCATE guarantees. Driver-verifying the
    // warehouse content against the events table proves the full
    // route-filter-reload path (P5 filename guard, CSV schema read,
    // truncate overwrite) through the streaming runtime.
    Q(
      "sm6_stream_truncate_reload",
      (s, dir) => {
        val root = graft.TempDirs.create("graft_sm6")
        val landing = root.resolve("landing")
        val backups = Files.createDirectories(landing.resolve("backups"))
        val ev = Tables(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        stageCsvVersion(ev.filter(col("event_id") < 5000), backups,
          "events_v1.csv", 1000000000000L)
        stageCsvVersion(ev, backups, "events_v2.csv", 1000000060000L)
        IncrementalLoad.truncateReloadStream(
          s, landing.toString, "events_v*.csv", ev.schema,
          root.resolve("warehouse").toString,
          root.resolve("checkpoint").toString)
          .awaitTermination()
        s.read.parquet(root.resolve("warehouse").toString)
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin),
      bench = false
    ),

    // SM7: the built-in stateful SESSION operator (`session_window`,
    // EventStreams.sessionize) run to drain in complete mode over the
    // ordered replay. Session semantics — merge events within a
    // 30-minute gap — must coincide with ev2's lag/running-sum batch
    // formulation, so the oracle is ev2's CTE reduced to the streaming
    // operator's output columns (user_id, session_start, n_events).
    Q(
      "sm7_stream_sessions",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm7")
        val ev = Tables(s, dir, "events").select("event_id", "ts", "user_id")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val schema = s.read.parquet(landing.toString).schema
        val sessions = EventStreams.sessionize(
          s.readStream.schema(schema).parquet(landing.toString))
        val sinkName = s"graft_sm7_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        sessions.writeStream
          .format("memory").queryName(sinkName)
          .outputMode("complete")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .select("user_id", "session_start", "n_events")
          .orderBy("user_id", "session_start")
      },
      Some("""WITH g AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |         THEN 1 ELSE 0 END AS new_session
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sid AS (
             |  SELECT user_id, ts,
             |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM g)
             |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
             |FROM sid GROUP BY user_id, session_id ORDER BY user_id, session_start""".stripMargin),
      bench = false
    ),

    // SM8: custom typed state via mapGroupsWithState
    // (EventStreams.runningUserStats) run to drain: per user, cumulative
    // event/purchase counts and peak value carried in the state store
    // across three micro-batches. Each batch emits the user's running
    // totals; all three stats are MONOTONE, so max() per user over the
    // update-mode emissions IS the final state — which must equal the
    // plain batch aggregation over the whole log.
    Q(
      "sm8_stream_user_stats",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm8")
        val ev = Tables(s, dir, "events")
          .select("event_id", "user_id", "event_type", "value")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val schema = s.read.parquet(landing.toString).schema
        val stats = EventStreams.runningUserStats(
          s.readStream.schema(schema).parquet(landing.toString))
          .toDF("user_id", "stats")
        val sinkName = s"graft_sm8_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        stats.writeStream
          .format("memory").queryName(sinkName)
          .outputMode("update")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .groupBy("user_id")
          .agg(
            max(col("stats.n_events")).as("n_events"),
            max(col("stats.n_purchases")).as("n_purchases"),
            max(col("stats.peak_value")).as("peak_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
             |  max(value) AS peak_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      bench = false
    ),

    // SM9: copy-on-write MERGE apply — ChangeCapture's A→B changelog
    // replayed as three key-ordered micro-batches into the
    // bucket-partitioned snapshot-A lake via StreamingMerge (per batch:
    // rewrite only the buckets the batch's keys hash into; delete =
    // anti-join, upsert = anti-join + union). Draining the stream must
    // reproduce snapshot B exactly — the oracle recomputes B from the
    // raw orders table, so a dropped delete, double-applied upsert, or
    // bucket routing error all hash-mismatch. The incremental successor
    // to sm6's truncate-reload: same trigger lifecycle, O(churn) work.
    Q(
      "sm9_stream_cdc_apply",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm9")
        val snapA = graft.operators.ChangeCapture.snapshotA(s, dir)
        StreamingMerge.seedSnapshot(snapA, "o_orderkey", state.toString, numBuckets = 8)
        stageOrderedChunks(
          graft.operators.ChangeCapture.changelog(s, dir),
          "o_orderkey", Seq(5000L, 10000L), landing)
        val schema = s.read.parquet(landing.toString).schema
        StreamingMerge.applyChangesStream(
          s, landing.toString, schema, "o_orderkey", state.toString,
          numBuckets = 8, ckpt.toString,
          toUpsert = ch =>
            ch.select(col("o_orderkey"), col("new_price").as("o_totalprice")),
          maxFilesPerTrigger = Some(1))
          .awaitTermination()
        // committed-read path: identical to a plain read once the last
        // batch's manifest is gone, and the snapshot-isolation the
        // protocol guarantees is what StreamingMergeSpec crash-tests
        StreamingMerge.readCommitted(s, state.toString)
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
             |       ELSE o_totalprice END AS o_totalprice
             |FROM orders WHERE o_orderkey % 5 <> 0
             |ORDER BY o_orderkey""".stripMargin),
      bench = false
    ),

    // SM10: SLIDING windows through the streaming runtime — ev10's
    // 7-day/1-day weekly-active-users aggregation run as a real
    // three-micro-batch file stream (complete mode, so every window
    // emits after drain). Sliding windows multiply state by the slide
    // ratio (each event lives in 7 open windows); the watermark bounds
    // it in an always-on deployment. Oracle = ev10's SQL verbatim.
    Q(
      "sm10_stream_sliding",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm10")
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val sinkName = s"graft_sm10_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val raw = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        // streaming exact-distinct: countDistinct isn't incrementally
        // aggregable, so stream the (window, user) pre-aggregation —
        // the standard two-level distinct — and finish the count on
        // the drained sink table.
        val perUser = raw
            .groupBy(window(col("ts"), "7 days", "1 day").as("w"), col("user_id"))
            .agg(count(lit(1)).as("n"))
        perUser.writeStream
          .format("memory")
          .queryName(sinkName)
          .outputMode("complete")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .groupBy(col("w.start").as("w_start"))
          .agg(count(lit(1)).as("wau"))
          .orderBy("w_start")
      },
      // ev10's oracle, verbatim (EventOps.scala keeps the commentary)
      Some("""WITH e AS (SELECT user_id,
             |            CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events),
             |x AS (SELECT user_id, d - k * INTERVAL 1 DAY AS w_start
             |      FROM e CROSS JOIN unnest(generate_series(0, 6)) AS t(k))
             |SELECT w_start, count(DISTINCT user_id) AS wau
             |FROM x GROUP BY w_start ORDER BY w_start""".stripMargin),
      bench = false
    ),

    // SM11: stream-static AS-OF join (aj1's streaming twin): purchases
    // arrive as three micro-batches; each batch is as-of joined against
    // the static view table via the same AsofJoin operator the batch
    // row uses. Per-probe-row independence is what makes the as-of
    // incrementally computable with NO cross-batch state: a probe row's
    // match depends only on the static build side, so batch-at-a-time
    // equals one-shot — the property this row proves through the real
    // streaming runtime (checkpointed foreachBatch, append sink).
    // Oracle: aj1's SQL, verbatim.
    Q(
      "sm11_stream_asof",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm11")
        val out = graft.TempDirs.create("graft_sm11_out").toString
        val ev = Tables(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        stageOrderedChunks(purchases, "event_id", Seq(3000L, 6000L), landing)
        val views = ev.filter(col("event_type") === "view")
        val schema = s.read.parquet(landing.toString).schema
        s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            graft.operators.AsofJoin.asofBackward(
              batch, views,
              keys = Seq("user_id"), probeTime = "ts", buildTime = "ts",
              payload = Seq("event_id" -> "last_view"), left = true)
              .select("event_id", "user_id", "last_view")
              .write.mode("append").parquet(out)
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out).orderBy("event_id")
      },
      Some("""SELECT p.event_id, p.user_id, v.event_id AS last_view
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
             |  ON p.user_id = v.user_id AND p.ts >= v.ts
             |ORDER BY p.event_id""".stripMargin),
      bench = false
    ),

    // SM12: streaming document chunking (ch1's streaming twin). The
    // chunker is a stateless per-row map, so the streaming form needs
    // no state store at all — each micro-batch chunks its own documents
    // and appends; the drained sink must equal the one-shot batch
    // chunking. This is the ingest shape a landing corpus runs: chunk
    // on arrival, append to the training store. Oracle: ch1's SQL,
    // verbatim.
    Q(
      "sm12_stream_chunk",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm12")
        val docs = Tables(s, dir, "documents").select("doc_id", "text")
        stageOrderedChunks(docs, "doc_id", Seq(170L, 340L), landing)
        val sinkName = s"graft_sm12_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        graft.operators.Chunking.chunk(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing.toString))
          .writeStream
          .format("memory")
          .queryName(sinkName)
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName).orderBy("doc_id", "chunk_idx")
      },
      // ch1's oracle, verbatim (Chunking.scala keeps the commentary)
      Some(graft.operators.Chunking.all.head.oracle.get),
      bench = false
    ),

    // SM14: streaming upsert into the SnapshotLog table format — three
    // CDC micro-batches (full seed, then two update/insert waves)
    // applied via foreachBatch { mergeInto }, so the log gains one
    // time-travelable snapshot per batch and the drained CURRENT
    // snapshot must equal the relational replay of all three upserts.
    // The apply is IDEMPOTENT for key-unique batches (replaying a batch
    // re-replaces rows with identical values), which is exactly what
    // foreachBatch's at-least-once contract needs: a crash between a
    // merge commit and the checkpoint commit replays into the same
    // final state. Oracle: the three-wave CASE replay over orders.
    Q(
      "sm14_stream_snapshot_merge",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm14")
        val root = state.resolve("log").toString
        val orders = Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus")
        val wave2 = orders.filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .withColumn("o_orderstatus", lit("U"))
        val wave3 = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("o_orderstatus", lit("W"))
          .unionByName(
            orders.filter(pmod(col("o_orderkey"), lit(11)) === 0)
              .withColumn("o_orderkey", col("o_orderkey") + lit(20000000L))
              .withColumn("o_orderstatus", lit("Z")))
        stageBatches(Seq(orders, wave2, wave3), landing)
        s.readStream.schema(orders.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val sp = batch.sparkSession
            if (graft.operators.SnapshotLog.currentId(sp, root) == 0L)
              graft.operators.SnapshotLog.append(sp, root, batch)
            else
              graft.operators.SnapshotLog.mergeInto(
                sp, root, batch, Seq("o_orderkey"))
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        graft.operators.SnapshotLog.read(s, root).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |       CASE WHEN o_orderkey % 7 = 0 THEN 'W'
             |            WHEN o_orderkey % 5 = 0 THEN 'U'
             |            ELSE o_orderstatus END AS o_orderstatus
             |FROM orders
             |UNION ALL
             |SELECT o_orderkey + 20000000, o_custkey, 'Z'
             |FROM orders WHERE o_orderkey % 11 = 0
             |ORDER BY o_orderkey""".stripMargin),
      bench = false
    ),

    // SM25: the MERGE-ON-READ twin of sm14 — the same three-wave
    // upsert stream, but each wave commits through mergeIntoMoR:
    // matched rows die via a positional delete vector and the wave
    // appends, so NO existing data file rewrites per batch. That is
    // the write-amplification fix for high-frequency upsert streams
    // at 100 TB (CoW merge rewrites every hot file every batch; MoR
    // writes churn-sized vectors and amortizes via rewriteDeletes in
    // maintenance, not on the ingest path). Vectors from waves 2 and
    // 3 stay OUTSTANDING at read time — the final read must apply
    // both. Shares sm14's oracle VERBATIM: the CoW and MoR streaming
    // upsert paths must be observationally identical. Replay is
    // value-idempotent: a re-delivered wave kills its own prior
    // append by key and re-appends identical rows.
    Q(
      "sm25_stream_mor_upsert",
      (s, dir) => {
        val (landing, state, _, ckpt) = tempDirs("graft_sm25")
        val root = state.resolve("log").toString
        val orders = Tables(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderstatus")
        val wave2 = orders.filter(pmod(col("o_orderkey"), lit(5)) === 0)
          .withColumn("o_orderstatus", lit("U"))
        val wave3 = orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("o_orderstatus", lit("W"))
          .unionByName(
            orders.filter(pmod(col("o_orderkey"), lit(11)) === 0)
              .withColumn("o_orderkey", col("o_orderkey") + lit(20000000L))
              .withColumn("o_orderstatus", lit("Z")))
        stageBatches(Seq(orders, wave2, wave3), landing)
        s.readStream.schema(orders.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val sp = batch.sparkSession
            if (graft.operators.SnapshotLog.currentId(sp, root) == 0L)
              graft.operators.SnapshotLog.append(sp, root, batch)
            else
              graft.operators.SnapshotLog.mergeIntoMoR(
                sp, root, batch, Seq("o_orderkey"))
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        graft.operators.SnapshotLog.read(s, root).orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey,
             |       CASE WHEN o_orderkey % 7 = 0 THEN 'W'
             |            WHEN o_orderkey % 5 = 0 THEN 'U'
             |            ELSE o_orderstatus END AS o_orderstatus
             |FROM orders
             |UNION ALL
             |SELECT o_orderkey + 20000000, o_custkey, 'Z'
             |FROM orders WHERE o_orderkey % 11 = 0
             |ORDER BY o_orderkey""".stripMargin),
      bench = false
    ),

    // SM20: classify-as-you-ingest — nb1's operational twin. The NB
    // model is FIT ONCE on the batch training split (a trained
    // classifier is a static artifact a production stream broadcasts,
    // unlike sm18's cumulative LM), persisted so micro-batches don't
    // re-aggregate the training corpus, then each replayed test chunk
    // is scored independently: per-doc prediction depends only on the
    // doc and the fixed model, so stream output == batch output row
    // for row and nb1's oracle applies verbatim. Batch writes are
    // batchId-keyed overwrites (sm16's replay-idempotency rule).
    Q(
      "sm20_stream_classify",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm20")
        val out = graft.TempDirs.create("graft_sm20_out").toString
        val d = Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text"))
        val train = d.filter(col("doc_id") % 2 === 0)
          .select(col("lang").as("label"), split(col("text"), " ").as("toks"))
        val (classes0, model0) = graft.operators.Classification
          .fit(train, "label", "toks")
        val classes = graft.CacheScope.track(classes0.persist())
        val model = graft.CacheScope.track(model0.persist())
        stageOrderedChunks(
          d.filter(col("doc_id") % 2 === 1), "doc_id", Seq(170L, 340L), landing)
        s.readStream.schema(d.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
          .writeStream
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            val b = batch
              .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
            graft.operators.Classification.predict(b, classes, model)
              .join(b.select(col("doc_id"), col("lang").as("actual_lang")), "doc_id")
              .select(
                col("doc_id"), col("pred_label"), col("score6"),
                col("actual_lang"),
                (col("pred_label") === col("actual_lang")).as("correct"))
              .write.mode("overwrite").parquet(s"$out/batch=$batchId")
            ()
          }
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.read.parquet(out)
          .select("doc_id", "pred_label", "score6", "actual_lang", "correct")
          .orderBy("doc_id")
      },
      // nb1's oracle, verbatim: the fixed-model stream drains to the
      // batch answer
      graft.operators.Classification.all
        .find(_.name == "nb1_naive_bayes").flatMap(_.oracle),
      bench = false
    ),

    // SM21: streaming OHLC bars — ev11's twin through the real
    // streaming aggregation runtime (sm2's shape: windowed groupBy,
    // complete mode, memory sink, AvailableNow drain). min_by/max_by
    // are declarative aggs, so their partials merge across micro-
    // batches exactly like count/sum — the exact composite key makes
    // the merged open/close independent of batch arrival order, which
    // is the whole point of the twin: drain == batch answer, oracle
    // verbatim.
    Q(
      "sm21_stream_ohlc",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm21")
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val sinkName =
          s"graft_sm21_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        val raw = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
        val aggs = graft.operators.EventOps.ohlcAggs
        raw
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(aggs.head, aggs.tail: _*)
          .writeStream
          .format("memory")
          .queryName(sinkName)
          .outputMode("complete")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName)
          .select(
            col("event_type"), col("window.start").as("hour"),
            col("open_v"), col("high_v"), col("low_v"), col("close_v"),
            col("n_events"), col("volume"))
          .orderBy("event_type", "hour")
      },
      // ev11's oracle, verbatim
      graft.operators.EventOps.all
        .find(_.name == "ev11_ohlc_bars").flatMap(_.oracle),
      bench = false
    ),

    // SM22: watermark-bounded streaming dedup via the BUILT-IN
    // `dropDuplicatesWithinWatermark` — the engine-managed-state
    // counterpart to sm3's explicit fingerprint-state design (and
    // sm17's flatMapGroupsWithState): state eviction is the
    // WATERMARK's job, so a 100 TB stream's dedup state is bounded by
    // the delay window instead of growing forever. The delay here
    // exceeds the replayed span, so the drain equals a global
    // DISTINCT; only the KEY columns are emitted because the API keeps
    // an arbitrary first-seen row per key — emitting payload columns
    // would hash-compare nondeterministically, the keys never do.
    Q(
      "sm22_dedup_within_watermark",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm22")
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        val sinkName =
          s"graft_sm22_${java.util.UUID.randomUUID().toString.replace("-", "")}"
        s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(landing.toString)
          .withWatermark("ts", "30 days")
          .dropDuplicatesWithinWatermark("user_id", "event_type")
          .select(col("user_id"), col("event_type"))
          .writeStream
          .format("memory")
          .queryName(sinkName)
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
          .awaitTermination()
        s.table(sinkName).orderBy("user_id", "event_type")
      },
      Some("""SELECT DISTINCT user_id, event_type FROM events
             |ORDER BY user_id, event_type""".stripMargin),
      bench = false
    ),

    // SM23: per-user running enrichment on the arbitrary-state API v2
    // (transformWithState + StatefulProcessor + named ValueState,
    // RocksDB provider as the API requires) — the third point on the
    // streaming-state spectrum after sm3 (operator-managed parquet
    // state) and sm17 (flatMapGroupsWithState). The event_id-ordered
    // replay is ts-ordered (the generator's ids are time-monotone), so
    // the drained enrichment equals the batch window computation — the
    // oracle.
    Q(
      "sm23_statev2_enrich",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm23")
        val out = graft.TempDirs.create("graft_sm23_out").toString
        val ev = Tables(s, dir, "events")
        stageOrderedChunks(ev, "event_id", Seq(3000L, 6000L), landing)
        StateV2Enrich.enrichStreamRocksDb(
          s, landing.toString, ev.schema, out, ckpt.toString)
        s.read.parquet(out)
          .select("event_id", "user_id", "seq", "cum_fx")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(row_number() OVER w AS BIGINT) AS seq,
             |  CAST(SUM(CAST(round(value * 10000) AS BIGINT)) OVER (
             |    w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_fx
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY event_id""".stripMargin),
      bench = false
    ),

    // SM24: EVENT-TIME session windows with TIMER-driven timeout
    // emission on the state API v2 (TimeMode.EventTime + registerTimer
    // + handleExpiredTimer, RocksDB provider) — the state-BOUNDING half
    // sm23 leaves unexercised: a session emits either when a later
    // event exceeds the 12 h gap or when the watermark passes its
    // end+gap timer, after which the key's state is CLEARED. Two
    // far-future sentinel batches (user −1, never emitted) advance the
    // watermark past every real timer so the drain closes all sessions
    // deterministically. The oracle is DuckDB's lag/running-sum
    // sessionization of the same table — row-for-row equality proves
    // both closure paths agree with the batch semantics.
    Q(
      "sm24_session_timeout",
      (s, dir) => {
        val (landing, _, _, ckpt) = tempDirs("graft_sm24")
        val out = graft.TempDirs.create("graft_sm24_out").toString
        val ev = Tables(s, dir, "events")
        val gapUs = 12L * 3600 * 1000000L
        val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
        def sentinel(id: Long, plusDays: Int) =
          s.range(1).select(
            lit(id).as("event_id"),
            lit(new java.sql.Timestamp(maxTs.getTime + plusDays * 86400000L))
              .as("ts"),
            lit(-1L).as("user_id"), lit("sentinel").as("event_type"),
            lit(0.0).as("value"), lit("").as("props"))
        stageBatches(
          Seq(
            ev.filter(col("event_id") < 3000),
            ev.filter(col("event_id") >= 3000 && col("event_id") < 6000),
            ev.filter(col("event_id") >= 6000),
            sentinel(9000001L, 35), sentinel(9000002L, 36)),
          landing)
        SessionTimeout.sessionStreamRocksDb(
          s, landing.toString, ev.schema, gapUs, out, ckpt.toString)
        s.read.parquet(out)
          .select("user_id", "start_us", "end_us", "n_events", "sum_fx")
          .orderBy("user_id", "start_us")
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |         CAST(round(value * 10000) AS BIGINT) AS v_fx
             |  FROM events),
             |o AS (
             |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
             |                   OR ts_us - lag(ts_us) OVER w > 43200000000
             |                 THEN 1 ELSE 0 END AS brk
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
             |s AS (
             |  SELECT *, SUM(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM o)
             |SELECT user_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
             |       count(*) AS n_events, CAST(sum(v_fx) AS BIGINT) AS sum_fx
             |FROM s GROUP BY user_id, sid
             |ORDER BY user_id, start_us""".stripMargin),
      bench = false
    )
  )
}
