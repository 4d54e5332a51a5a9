package graft.pipeline

import graft.{Q, Tables}
import graft.operators.{Decontamination, Dedup, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The composed training-corpus pipeline — every hygiene operator the
  * library provides, in the order a 100 TB pretraining ingest runs them:
  *
  *   quality filter → language filter → exact dedup → near-dedup
  *   (MinHash/LSH canonical reps) → deterministic split → test-set
  *   decontamination → partitioned lake write
  *
  * This is the training-data analogue of `recipes.RecipeEtl` (the
  * reference's composed ETL): one callable that strings the individually
  * oracle-verified operators into an executable product, with a row
  * accounting [[Report]] so every drop is attributable.
  *
  * Order matters for cost at scale: the per-row filters (quality, lang)
  * run FIRST on the scan — zero shuffle, pushed projections — so the
  * shuffling stages (dedup groupBy, LSH banding, gram joins) see only
  * surviving rows. Filters compose per-row; dedup keys are 8-byte
  * hashes; the split is a deterministic per-row hash (re-runnable,
  * backfill-safe); decontamination drops test docs sharing any 5-gram
  * with train. The lake is written partitioned by split so every
  * downstream trainer/eval scan partition-prunes.
  */
object CorpusPipeline {

  final case class Report(
      input: Long,
      afterQuality: Long,
      afterLang: Long,
      afterExact: Long,
      afterNear: Long,
      train: Long,
      validation: Long,
      test: Long,
      testClean: Long) {
    def json: String =
      s"""{"input":$input,"after_quality":$afterQuality,"after_lang":$afterLang,""" +
        s""""after_exact":$afterExact,"after_near":$afterNear,"train":$train,""" +
        s""""val":$validation,"test":$test,"test_clean":$testClean}"""
  }

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** tx2's keep-predicate: ≥ 20 tokens and ≤ 25% stopwords — via the
    * native TokenStats expression (one codegen'd byte pass; this
    * predicate reads every byte of the corpus, so it must not run an
    * interpreted per-token lambda).
    */
  private def qualityPred: org.apache.spark.sql.Column = {
    val ts = call_function(graft.functions.GraftFunctions.TokenStatsName,
      col("text"), typedlit(Stopwords))
    ts.getField("n_tokens") >= 20 &&
      ts.getField("n_stop").cast("double") / ts.getField("n_tokens") <= 0.25
  }

  private final case class Built(
      report: Report, clean: DataFrame, persisted: Seq[DataFrame])

  /** Stage wall-clock to stderr when SPARK_GRAFT_PIPELINE_TIMING=1 —
    * the operational "where did the run go" hook (stderr so the stdout
    * JSON report stays machine-parseable).
    */
  private val timing = sys.env.get("SPARK_GRAFT_PIPELINE_TIMING").contains("1")
  private def timed[A](stage: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    if (timing) System.err.println(
      f"[pipeline] $stage%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  private def build(spark: SparkSession, sfDir: String): Built = {
    graft.functions.GraftFunctions.register(spark) // qualityPred's TokenStats
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // Action discipline: the pipeline's cost at small-to-mid SF is bound
    // by the NUMBER of Spark actions, not data volume (profiled — see
    // BENCH_NOTES). input/quality/lang tallies come from ONE scan;
    // after-near comes from the split tallies; only frames with ≥ 2
    // consumers are persisted (exact: clustering + the rejoin; split:
    // tallies + gram sides + lake write).
    val inCounts = timed("counts")(docs.agg(
      count(lit(1)),
      coalesce(sum(when(qualityPred, 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(qualityPred && col("lang") === "en", 1L).otherwise(0L)),
        lit(0L))).head())
    val (input, afterQuality, afterLang) =
      (inCounts.getLong(0), inCounts.getLong(1), inCounts.getLong(2))

    val english = docs.filter(qualityPred && col("lang") === "en")

    // exact dedup: one row per content fingerprint, smallest id canonical
    val exact = english
      .withColumn("fp", md5(col("text")))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("doc_id") === col("keep_id"))
      .drop("fp", "keep_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val afterExact = timed("exact")(exact.count())

    // near-dedup: fixed-point LSH clustering over the SURVIVING frame,
    // keep each cluster's canonical representative
    val reps = timed("cluster")(Dedup.clusterFrame(exact))
      .filter(col("is_canonical")).select("doc_id")
    val near = exact.join(reps, Seq("doc_id"))

    val split = Sampling.hashSplit(near, col("doc_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one aggregation job for all three tallies, not a pass per split
    val tallies = timed("tallies")(split.agg(
      coalesce(sum(when(col("split") === "train", 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("split") === "val", 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col("split") === "test", 1L).otherwise(0L)), lit(0L))).head())
    val Seq(train, validation, test) = (0 to 2).map(tallies.getLong)
    val afterNear = train + validation + test

    // decontamination: drop test docs sharing any 5-gram with train.
    // testClean is derived from the DIRTY count (test − contaminated):
    // counting the small dirty set directly skips a whole anti-join pass
    // over the corpus; the anti-join itself runs once, inside the lake
    // write that publishes `clean`.
    val trainGrams = Decontamination
      .gramsOf(split.filter(col("split") === "train").select("doc_id", "text"))
      .select("g").distinct()
    val dirtyTest = Decontamination
      .gramsOf(split.filter(col("split") === "test").select("doc_id", "text"))
      .join(trainGrams, Seq("g"), "left_semi")
      .select("doc_id").distinct()
    val clean = split.join(dirtyTest, Seq("doc_id"), "left_anti")
    val testClean = test - timed("decontam")(dirtyTest.count())

    Built(
      Report(input, afterQuality, afterLang, afterExact, afterNear,
        train, validation, test, testClean),
      clean,
      Seq(exact, split))
  }

  def run(spark: SparkSession, sfDir: String, outDir: String): Report = {
    val b = build(spark, sfDir)
    b.clean.write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("split")
      .parquet(outDir)

    b.persisted.foreach(_.unpersist())
    // Dedup.clusterFrame persists CacheScope-tracked band/label frames
    // that outlive this call; all counts and the lake write are done, so
    // release them here rather than leaking one set per pipeline run.
    graft.CacheScope.release()
    b.report
  }

  /** One-row frame of the composed pipeline's [[Report]] accounting —
    * the oracle-checkable surface of the END-TO-END composition (every
    * stage is individually oracle-verified; this proves the counts of
    * the stages chained together). No lake write: the accounting is the
    * product here.
    */
  def accountingFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val b = build(spark, sfDir)
    b.persisted.foreach(_.unpersist())
    graft.CacheScope.release()
    val r = b.report
    import spark.implicits._
    Seq((r.input, r.afterQuality, r.afterLang, r.afterExact, r.afterNear,
      r.train, r.validation, r.test, r.testClean))
      .toDF("input", "after_quality", "after_lang", "after_exact",
        "after_near", "train", "val", "test", "test_clean")
  }

  /** CP1 oracle: the full composition recomputed in SQL. Quality/lang
    * filters, windowed exact dedup, the Dedup minhash→banding math
    * (identical CTEs to dd2/dd6's oracle), near-dedup as true connected
    * components via a recursive transitive closure over the
    * bucket-sharing graph (the fixed point clusterFrame iterates to),
    * the sp1 hash split, and the dc2 gram-overlap check.
    */
  private val accountingSql: String = {
    val splitCase =
      s"""CASE WHEN ${Sampling.bucketSql("split", "doc_id")} < 80 THEN 'train'
         |            WHEN ${Sampling.bucketSql("split", "doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END""".stripMargin
    s"""WITH RECURSIVE
       |qf AS (SELECT doc_id, text, lang,
       |         len(string_split(text, ' ')) AS toks,
       |         len(list_filter(string_split(text, ' '),
       |           t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is'))) AS stops
       |       FROM documents),
       |quality AS (SELECT doc_id, text, lang FROM qf
       |            WHERE toks >= 20 AND CAST(stops AS DOUBLE) / toks <= 0.25),
       |en AS (SELECT doc_id, text FROM quality WHERE lang = 'en'),
       |ex AS (SELECT doc_id, text FROM (
       |         SELECT doc_id, text,
       |           min(doc_id) OVER (PARTITION BY md5(text)) AS keep FROM en)
       |       WHERE doc_id = keep),
       |dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM ex),
       |hp AS (SELECT doc_id,
       |         CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS h1,
       |         CAST('0x' || substr(md5(token), 9, 8) AS BIGINT) AS h2
       |       FROM dtok),
       |mh AS (SELECT doc_id, seed, min((h1 + seed * h2) % 4294967296) AS minhash
       |       FROM hp CROSS JOIN range(104) t(seed) GROUP BY doc_id, seed),
       |sigs AS (SELECT doc_id, CAST(seed // 13 AS INT) AS band,
       |           CAST('0x' || substr(md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15) AS BIGINT) AS sig
       |         FROM mh GROUP BY doc_id, band),
       |edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
       |          FROM sigs a JOIN sigs b
       |            ON a.band = b.band AND a.sig = b.sig AND a.doc_id <> b.doc_id),
       |reach(doc_id, r) AS (
       |  SELECT doc_id, doc_id FROM ex
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.doc_id),
       |labels AS (SELECT doc_id, min(r) AS rep FROM reach GROUP BY doc_id),
       |near AS (SELECT ex.doc_id, ex.text FROM ex
       |         JOIN labels ON ex.doc_id = labels.doc_id
       |         WHERE ex.doc_id = labels.rep),
       |sp AS (SELECT doc_id, text, $splitCase AS split FROM near),
       |wd AS (SELECT doc_id, split, string_split(text, ' ') AS words FROM sp),
       |gg AS (SELECT doc_id, split,
       |         unnest(list_distinct(list_transform(
       |           generate_series(1, len(words) - 4),
       |           i -> CAST('0x' || substr(md5(array_to_string(words[i:i + 4], ' ')), 1, 8) AS BIGINT)))) AS g
       |       FROM wd),
       |tr AS (SELECT DISTINCT g FROM gg WHERE split = 'train'),
       |te AS (SELECT doc_id, g FROM gg WHERE split = 'test'),
       |dirty AS (SELECT DISTINCT doc_id FROM te SEMI JOIN tr ON te.g = tr.g)
       |SELECT
       |  (SELECT count(*) FROM documents) AS input,
       |  (SELECT count(*) FROM quality) AS after_quality,
       |  (SELECT count(*) FROM en) AS after_lang,
       |  (SELECT count(*) FROM ex) AS after_exact,
       |  (SELECT count(*) FROM near) AS after_near,
       |  (SELECT count(*) FROM sp WHERE split = 'train') AS train,
       |  (SELECT count(*) FROM sp WHERE split = 'val') AS "val",
       |  (SELECT count(*) FROM sp WHERE split = 'test') AS test,
       |  (SELECT count(*) FROM sp WHERE split = 'test'
       |     AND doc_id NOT IN (SELECT doc_id FROM dirty)) AS test_clean""".stripMargin
  }

  /** CP2: the PACKAGING funnel that follows cp1's hygiene pass — the
    * round-6 curation tier composed end-to-end with per-stage counts:
    *
    *   train split → entropy quality band (tx13's mid band) →
    *   weighted per-source cap (sp5's exponential keys, k=12) →
    *   chunk-window yield (ch1's 32/24 windows)
    *
    * Every stage is a per-row flag or bounded window — no stage adds a
    * corpus-sized shuffle beyond sp5's per-source window — and the
    * chunk yield is computed arithmetically (last_k + 1 per doc), not
    * by materializing chunk rows, so the accounting itself is scan-
    * bound. Stage names carry an ordinal prefix so the output sorts in
    * funnel order in any engine.
    */
  private def packagingFrame(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    val train = Sampling
      .hashSplit(
        Tables(s, dir, "documents").select("doc_id", "source", "text", "n_chars"),
        col("doc_id"))
      .filter(col("split") === "train")
    val entR = round(call_function(
      graft.functions.GraftFunctions.CharEntropyName, col("text")), 6)
    // EAGERLY materialized: three of the four count branches share this
    // subtree AND they are sibling stages of ONE crossJoin action — a
    // lazy persist makes them race the uncached partitions and re-run
    // the full-corpus entropy pass per branch (the gr4 lesson, see
    // GraphOps scaladoc; measured there: lazy persist 2x slower than no
    // cache). localCheckpoint(true) computes the pass once, up front.
    val banded = train.withColumn("ent", entR)
      .filter(col("ent") >= 3.5 && col("ent") <= 5.5)
      .localCheckpoint(true)
    // ONE definition with sp5 (Sampling.wrsKey): the cap membership here
    // must stay bit-identical to sp5's sample or the funnel counts drift
    val key = Sampling.wrsKey(col("doc_id"), col("n_chars"))
    // eagerly materialized for the same reason: two sibling branches
    // (doc count + chunk-yield sum) of the same action share it
    val capped = banded
      .withColumn("key", key)
      .withColumn("rk",
        row_number().over(Window.partitionBy("source").orderBy("key", "doc_id")))
      .filter(col("rk") <= 12)
      .localCheckpoint(true)
    // chunk yield without materializing chunks: last_k + 1 per doc
    val lastK = floor(
      (greatest(size(split(col("text"), " ")) - graft.operators.Chunking.Width,
        lit(0)) + (graft.operators.Chunking.Stride - 1)) /
        graft.operators.Chunking.Stride).cast("long")
    val counts = train.agg(count(lit(1)).as("n1"))
      .crossJoin(banded.agg(count(lit(1)).as("n2")))
      .crossJoin(capped.agg(count(lit(1)).as("n3")))
      .crossJoin(capped.agg(
        coalesce(sum(lastK + 1L), lit(0L)).as("n4")))
    counts.select(expr(
      """stack(4,
        |  '1_train_split', n1,
        |  '2_entropy_band', n2,
        |  '3_weighted_cap', n3,
        |  '4_chunk_yield', n4) AS (stage, n_docs)""".stripMargin))
      .orderBy("stage")
  }

  private val packagingSql: String = {
    val w = graft.operators.Chunking.Width
    val st = graft.operators.Chunking.Stride
    s"""WITH t AS (SELECT doc_id, source, text, n_chars FROM documents
       |           WHERE ${Sampling.bucketSql("split", "doc_id")} < 80),
       |ed AS (SELECT doc_id, round(entropy(c), 6) AS ent
       |       FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c FROM t)
       |       GROUP BY doc_id),
       |q AS (SELECT t.* FROM t JOIN ed ON t.doc_id = ed.doc_id
       |      WHERE ed.ent >= 3.5 AND ed.ent <= 5.5),
       |cap AS (SELECT doc_id, text FROM (
       |          SELECT doc_id, text, row_number() OVER (PARTITION BY source ORDER BY
       |            ${Sampling.wrsKeySql("doc_id", "n_chars")},
       |            doc_id) AS rk
       |          FROM q)
       |        WHERE rk <= 12),
       |ch AS (SELECT CAST(coalesce(SUM(
       |         (greatest(len(string_split(text, ' ')) - $w, 0) + ${st - 1}) // $st + 1), 0) AS BIGINT) AS n
       |       FROM cap)
       |SELECT stage, n_docs FROM (
       |  SELECT '1_train_split' AS stage, count(*) AS n_docs FROM t
       |  UNION ALL SELECT '2_entropy_band', count(*) FROM q
       |  UNION ALL SELECT '3_weighted_cap', count(*) FROM cap
       |  UNION ALL SELECT '4_chunk_yield', n FROM ch)
       |ORDER BY stage""".stripMargin
  }

  /** Registry entries: the composed pipelines' accounting, driver-verified. */
  val all: Seq[Q] = Seq(
    Q("cp1_corpus_accounting",
      (s, dir) => accountingFrame(s, dir),
      Some(accountingSql)),
    Q("cp2_packaging_accounting",
      (s, dir) => packagingFrame(s, dir),
      Some(packagingSql)))

  /** CLI: sfDir outDir → one JSON report line. */
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, sfDir, outDir).json)
    spark.stop()
  }
}
