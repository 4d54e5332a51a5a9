package graft.operators

import graft.{Q, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Train/test decontamination — the n-gram-overlap check every
  * training-data pipeline runs before publishing an eval split: a test
  * document that shares any word n-gram with the training set has leaked
  * and must be flagged (dc1) or dropped (dc2). This is the C4/GPT-style
  * "13-gram decontamination" shape (we use 5-grams: the synthetic docs
  * are 40–120 words, so 13-grams would barely overlap at this SF; the
  * operator is width-parametric).
  *
  * Pipeline shape, chosen for 100 TB:
  *  - The split is [[Sampling.hashSplit]] — a per-row deterministic hash,
  *    no shuffle, reproducible in any engine (no rand()), so train/test
  *    membership never drifts between the runs that build the gram index
  *    and the runs that consume it.
  *  - Per-document gram extraction is the native [[graft.functions.NgramMd5Hashes]]
  *    expression: one codegen'd pass per document, byte-sliced windows,
  *    8-byte hashed grams (never gram strings) on the wire.
  *  - The train-gram index is `distinct` (one shuffle on the gram hash,
  *    map-side partial dedupe first), and the test probe is a gram-hash
  *    join against it — both sides partitioned by the same key, so at
  *    cluster scale this is a co-partitioned shuffle join with no
  *    broadcast of anything unbounded. At 100 TB you would additionally
  *    front the join with a bloom filter of the train grams
  *    (`spark.sql.optimizer.runtime.bloomFilter.enabled` does this at
  *    runtime for selective joins) and persist the gram index bucketed by
  *    `g` so repeated eval-set checks skip the train-side shuffle.
  *
  * Reference anchor: extends the reference's exact-ID duplicate check
  * (`src/data_validation.py:64-76`, "Duplicate recipe_id") to cross-split
  * content overlap, the scale analogue a 100 TB corpus needs.
  */
object Decontamination {

  /** n-gram width; 5 ≈ sentence-fragment granularity on this corpus. */
  private[graft] val N = 5

  /** (doc_id, g) distinct n-grams of any (doc_id, text) frame — shared
    * by the batch queries and the streaming twin.
    */
  private[graft] def gramsOf(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(
      col("doc_id"),
      explode(call_function(GraftFunctions.NgramName, col("text"), lit(N)))
        .as("g"))
  }

  /** (doc_id, split, g) — one row per DISTINCT n-gram per document. */
  private def grams(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    val docs = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
    Sampling
      .hashSplit(docs, col("doc_id"))
      .select(
        col("doc_id"),
        col("split"),
        explode(call_function(GraftFunctions.NgramName, col("text"), lit(N)))
          .as("g"))
  }

  /** The distinct train-split gram index — build once (persist or write
    * bucketed by `g`), probe many times; the static side of the
    * streaming contamination check.
    */
  def trainGramIndex(s: SparkSession, dir: String): DataFrame =
    grams(s, dir).filter(col("split") === "train").select("g").distinct()

  /** Shared oracle CTE: the same split + gram extraction in DuckDB SQL.
    * `words[i:i+${N - 1}]` is the 1-based inclusive slice = N words; its
    * space-joined form is byte-identical to the Spark expression's window
    * slice even for empty tokens from repeated spaces.
    */
  private[graft] val gramCte: String =
    s"""d AS (SELECT doc_id, string_split(text, ' ') AS words,
       |  CASE WHEN ${Sampling.bucketSql("split", "doc_id")} < 80 THEN 'train'
       |       WHEN ${Sampling.bucketSql("split", "doc_id")} < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |  FROM documents),
       |g AS (SELECT doc_id, split,
       |        unnest(list_distinct(list_transform(
       |          generate_series(1, len(words) - ${N - 1}),
       |          i -> CAST('0x' || substr(md5(array_to_string(words[i:i + ${N - 1}], ' ')), 1, 8) AS BIGINT)))) AS g
       |      FROM d),
       |tr AS (SELECT DISTINCT g FROM g WHERE split = 'train'),
       |te AS (SELECT doc_id, g FROM g WHERE split = 'test')""".stripMargin

  val all: Seq[Q] = Seq(
    // Per-test-document contamination report: how many of its distinct
    // 5-grams also appear anywhere in the train split.
    Q(
      "dc1_contamination",
      (s, dir) => {
        val g = graft.CacheScope.track(
          grams(s, dir).persist(StorageLevel.MEMORY_AND_DISK))
        val train = g.filter(col("split") === "train").select(col("g")).distinct()
        val test = g.filter(col("split") === "test").select(col("doc_id"), col("g"))
        test
          .join(train.withColumnRenamed("g", "tg"), col("g") === col("tg"), "left")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_grams"),
            count(col("tg")).as("n_contaminated"))
          .withColumn("contaminated", col("n_contaminated") > 0)
          .orderBy("doc_id")
      },
      Some(s"""WITH $gramCte
              |SELECT doc_id, count(*) AS n_grams, count(tr.g) AS n_contaminated,
              |       count(tr.g) > 0 AS contaminated
              |FROM te LEFT JOIN tr ON te.g = tr.g
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // The publishable eval set: test documents with ZERO train overlap —
    // a gram-level anti-join, then back to one row per clean document.
    // (Documents shorter than N words carry no grams and are clean by
    // definition; both engines surface them via the doc-level anti-join.)
    Q(
      "dc2_clean_testset",
      (s, dir) => {
        val g = graft.CacheScope.track(
          grams(s, dir).persist(StorageLevel.MEMORY_AND_DISK))
        val train = g.filter(col("split") === "train").select(col("g")).distinct()
        val dirty = g
          .filter(col("split") === "test")
          .join(train, Seq("g"), "left_semi")
          .select(col("doc_id"))
          .distinct()
        val docs = Tables(s, dir, "documents").select(col("doc_id"))
        Sampling
          .hashSplit(docs, col("doc_id"))
          .filter(col("split") === "test")
          .select(col("doc_id"))
          .join(dirty, Seq("doc_id"), "left_anti")
          .orderBy("doc_id")
      },
      Some(s"""WITH $gramCte,
              |dirty AS (SELECT DISTINCT doc_id FROM te SEMI JOIN tr ON te.g = tr.g)
              |SELECT doc_id FROM d
              |WHERE split = 'test' AND doc_id NOT IN (SELECT doc_id FROM dirty)
              |ORDER BY doc_id""".stripMargin)
    )
  )
}
