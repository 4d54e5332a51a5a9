package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Both operators key on a STABLE hash of the row's id — never
  * `rand()` — because at 100 TB the properties that matter are
  * operational, not statistical: the same document lands in the same
  * split on every rerun (no train/test leakage when the pipeline is
  * re-executed or backfilled), newly arriving data joins the right split
  * without reshuffling history, and any engine (here: DuckDB bit-for-bit)
  * can reproduce the assignment. Execution is a per-row projection +
  * filter — no shuffle, no state; Catalyst pushes the split filter into
  * the scan when a single split is selected.
  *
  * The md5-derived bucket `h(id) mod 100` reuses the Seed/Dedup
  * convention (first 8 md5 hex digits as uint32), so the oracle SQL is
  * the same expression.
  */
object Sampling {

  /** bucket ∈ [0,100): Spark side of the shared hash. */
  private[graft] def bucket(tag: String, id: Column): Column =
    pmod(
      conv(substring(md5(concat(lit(tag + ":"), id.cast("string"))), 1, 8), 16, 10)
        .cast("long"),
      lit(100))

  private[graft] def bucketSql(tag: String, id: String): String =
    s"CAST('0x' || substr(md5('$tag:' || CAST($id AS VARCHAR)), 1, 8) AS BIGINT) % 100"

  /** 80/10/10 train/val/test assignment for any keyed frame. */
  def hashSplit(df: DataFrame, id: Column, tag: String = "split"): DataFrame = {
    val b = bucket(tag, id)
    df.withColumn("split",
      when(b < 80, "train").when(b < 90, "val").otherwise("test"))
  }

  /** Per-stratum deterministic sampling: keep a row iff its bucket falls
    * under the stratum's rate — class rebalancing (keep all the rare
    * class, a sliver of the dominant one) as a scan-time filter.
    */
  def stratifiedSample(df: DataFrame, id: Column, rateFor: Column): DataFrame =
    df.filter(bucket("strat", id) < rateFor)

  val all: Seq[Q] = Seq(
    // Leakage-free 80/10/10 split of the document corpus.
    Q(
      "sp1_hash_split",
      (s, dir) =>
        hashSplit(Tables(s, dir, "documents").select("doc_id"), col("doc_id"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CASE WHEN ${bucketSql("split", "doc_id")} < 80 THEN 'train'
              |       WHEN ${bucketSql("split", "doc_id")} < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Class-rebalancing sample of the event stream: purchases kept at
    // 50%, errors at 2%, everything else at 10% — all per-row, no shuffle.
    Q(
      "sp2_stratified_sample",
      (s, dir) => {
        val rate = when(col("event_type") === "purchase", 50)
          .when(col("event_type") === "error", 2)
          .otherwise(10)
        stratifiedSample(
          Tables(s, dir, "events").select("event_id", "event_type"),
          col("event_id"), rate)
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, event_type FROM events
              |WHERE ${bucketSql("strat", "event_id")} <
              |  CASE event_type WHEN 'purchase' THEN 50 WHEN 'error' THEN 2 ELSE 10 END
              |ORDER BY event_id""".stripMargin)
    )
  )
}
