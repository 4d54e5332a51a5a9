package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** The arbitrary-state-v2 enrichment (sm23): per-user running
  * (seq, cum) through `transformWithState`'s named ValueState — the
  * fold must continue EXACTLY across a kill-and-resume restart (the
  * Agg state comes back from the RocksDB store via the checkpoint, not
  * from any operator-managed table), and in-batch rows must fold in
  * (ts, event_id) order regardless of physical row order.
  */
class StateV2EnrichSpec extends SparkSpec {

  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  private val schema: StructType =
    Seq((1L, ts(0L), 1L, 1.0)).toDF("event_id", "ts", "user_id", "value").schema

  test("running fold is batch-order exact and survives a kill-and-resume") {
    val root = Files.createTempDirectory("sv2_resume")
    val landing = Files.createDirectories(root.resolve("landing"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // batch 0: user 1's rows deliberately staged out of ts order — the
    // handler must fold (e1, e2) by ts, not arrival
    ReplayStaging.stage(landing, 0, Seq(
      (2L, ts(2000L), 1L, 0.5),
      (1L, ts(1000L), 1L, 1.0),
      (3L, ts(1500L), 2L, 2.0)).toDF("event_id", "ts", "user_id", "value"))
    StateV2Enrich.enrichStreamRocksDb(spark, landing.toString, schema, out, ckpt)
    val after1 = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after1 === Seq(
      (1L, 1L, 1L, 10000L), // e1 first by ts: seq 1, cum 1.0
      (2L, 1L, 2L, 15000L), // e2 second: cum 1.5
      (3L, 2L, 1L, 20000L)))

    // restart: user 1's fold must CONTINUE from (n=2, cum=1.5)
    ReplayStaging.stage(landing, 1, Seq(
      (4L, ts(3000L), 1L, 0.25),
      (5L, ts(3500L), 2L, 1.0)).toDF("event_id", "ts", "user_id", "value"))
    StateV2Enrich.enrichStreamRocksDb(spark, landing.toString, schema, out, ckpt)
    val after2 = spark.read.parquet(out)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after2 === Seq(
      (1L, 1L, 1L, 10000L),
      (2L, 1L, 2L, 15000L),
      (3L, 2L, 1L, 20000L),
      (4L, 1L, 3L, 17500L), // resumed: seq 3, cum 1.75
      (5L, 2L, 2L, 30000L)),
      "state restored from the store must continue the fold, not restart it")
  }
}
