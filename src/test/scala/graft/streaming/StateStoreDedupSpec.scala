package graft.streaming

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.types.StructType

/** The engine-state-store dedup twin (sm17): first-seen-wins through
  * `flatMapGroupsWithState`, with the fingerprint state carried by the
  * streaming checkpoint — killed and resumed mid-stream, the restarted
  * query must still suppress duplicates of documents accepted BEFORE
  * the kill (the state came back from the store, not from any
  * operator-managed table). Runs under the RocksDB provider, the store
  * a production deployment uses.
  */
class StateStoreDedupSpec extends SparkSpec {

  import spark.implicits._

  private val schema: StructType =
    Seq((1L, "x")).toDF("doc_id", "text").schema

  test("dedups across batches and across a kill-and-resume restart") {
    val root = Files.createTempDirectory("ssd_resume")
    val landing = Files.createDirectories(root.resolve("landing"))
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt").toString

    // run 1: two batches; 'alpha' collapses within batch 0 (min doc_id),
    // 'beta' repeats across batches
    ReplayStaging.stage(landing, 0, Seq((3L, "alpha"), (1L, "alpha"), (2L, "beta")).toDF("doc_id", "text"))
    ReplayStaging.stage(landing, 1, Seq((7L, "beta"), (8L, "gamma")).toDF("doc_id", "text"))
    StateStoreDedup.dedupStreamRocksDb(spark, landing.toString, schema, out, ckpt)
    val after1 = spark.read.parquet(out)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after1 === Seq((1L, "alpha"), (2L, "beta"), (8L, "gamma")))

    // kill happened (the query drained and stopped); new files land; a
    // RESTART from the same checkpoint must remember alpha/beta/gamma
    ReplayStaging.stage(landing, 2, Seq((11L, "alpha"), (12L, "delta")).toDF("doc_id", "text"))
    ReplayStaging.stage(landing, 3, Seq((13L, "delta"), (14L, "gamma")).toDF("doc_id", "text"))
    StateStoreDedup.dedupStreamRocksDb(spark, landing.toString, schema, out, ckpt)
    val after2 = spark.read.parquet(out)
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(after2 === Seq((1L, "alpha"), (2L, "beta"), (8L, "gamma"), (12L, "delta")),
      "state restored from the store must suppress pre-kill duplicates; " +
        "batch-3 'delta' dup must also be suppressed by batch-2 state")
  }
}
