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
    ),

    // DC3: FUZZY decontamination — a test document leaks even when it is
    // a near-duplicate (paraphrase-level edit, boilerplate re-wrap) of a
    // train document that exact gram overlap (dc1/dc2) misses or
    // over-triggers on. Shape: bigram minhash→LSH banding on BOTH splits
    // (the fused MinhashBandSigs native expression), candidates = band
    // collisions ACROSS the split boundary (a co-partitioned (band, sig)
    // join — never test×train all-pairs), then the exact bigram-Jaccard
    // verify pass ≥ 0.8 and a per-test-doc report. This is dd7's
    // machinery pointed at the train/test boundary — the fuzzy
    // decontamination modern corpus pipelines run alongside the exact
    // one.
    Q(
      "dc3_fuzzy_decontam",
      (s, dir) => {
        GraftFunctions.register(s)
        val split = Sampling.hashSplit(
            Tables(s, dir, "documents").select("doc_id", "text"), col("doc_id"))
          .filter(col("split").isin("train", "test") && col("text").contains(" "))
        val bands = split
          .select(col("doc_id"), col("split"),
            posexplode(call_function(GraftFunctions.BandSigsName,
              col("text"), lit(Dedup.NumHashes), lit(Dedup.BandSize), lit(2))))
          .select(col("doc_id"), col("split"), col("pos").as("band"), col("col").as("sig"))
        val cand = bands.filter(col("split") === "test")
          .select(col("doc_id").as("test_id"), col("band"), col("sig"))
          .join(
            bands.filter(col("split") === "train")
              .select(col("doc_id").as("train_id"), col("band"), col("sig")),
            Seq("band", "sig"))
          .select("test_id", "train_id").distinct()
        val bg = split
          .select(col("doc_id"),
            call_function(GraftFunctions.BigramName, col("text")).as("bg"))
          .select(col("doc_id"), col("bg"), size(col("bg")).as("n"))
        cand
          .join(bg.as("bt"), col("test_id") === col("bt.doc_id"))
          .join(bg.as("br"), col("train_id") === col("br.doc_id"))
          .select(col("test_id"), col("train_id"),
            call_function(GraftFunctions.IntersectName, col("bt.bg"), col("br.bg"))
              .as("inter"),
            col("bt.n").as("na"), col("br.n").as("nb"))
          .select(col("test_id"), col("train_id"),
            (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
              .as("j"))
          .filter(col("j") >= 0.8)
          .groupBy("test_id")
          .agg(count(lit(1)).as("n_train_matches"), max(col("j")).as("max_jaccard"))
          .orderBy("test_id")
      },
      Some(s"""WITH d AS (SELECT doc_id, text,
              |  CASE WHEN ${Sampling.bucketSql("split", "doc_id")} < 80 THEN 'train'
              |       WHEN ${Sampling.bucketSql("split", "doc_id")} < 90 THEN 'val'
              |       ELSE 'test' END AS split
              |  FROM documents WHERE contains(text, ' ')),
              |w AS (SELECT doc_id, split, string_split(text, ' ') AS words FROM d),
              |bgr AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(words) - 1),
              |          i -> words[i] || ' ' || words[i + 1])) AS bg FROM w),
              |bhp AS (SELECT DISTINCT doc_id,
              |          CAST('0x' || substr(md5(bg), 1, 8) AS BIGINT) AS h1,
              |          CAST('0x' || substr(md5(bg), 9, 8) AS BIGINT) AS h2 FROM bgr),
              |bmh AS (SELECT doc_id, seed, min((h1 + seed * h2) % ${Dedup.Mod}) AS minhash
              |        FROM bhp CROSS JOIN range(${Dedup.NumHashes}) t(seed) GROUP BY doc_id, seed),
              |bsigs AS (SELECT doc_id, CAST(seed // ${Dedup.BandSize} AS INT) AS band,
              |            CAST('0x' || substr(md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY seed)), 1, 15) AS BIGINT) AS sig
              |          FROM bmh GROUP BY doc_id, band),
              |cand AS (SELECT DISTINCT t.doc_id AS test_id, r.doc_id AS train_id
              |         FROM bsigs t JOIN d dt ON t.doc_id = dt.doc_id
              |         JOIN bsigs r ON t.band = r.band AND t.sig = r.sig
              |         JOIN d dr ON r.doc_id = dr.doc_id
              |         WHERE dt.split = 'test' AND dr.split = 'train'),
              |bgt AS (SELECT doc_id,
              |          list_distinct(list_transform(generate_series(1, len(words) - 1),
              |            i -> CAST('0x' || substr(md5(words[i] || ' ' || words[i + 1]), 1, 8) AS BIGINT))) AS bg
              |        FROM w),
              |j AS (SELECT test_id, train_id,
              |        CAST(len(list_intersect(bt.bg, br.bg)) AS DOUBLE) /
              |          (len(bt.bg) + len(br.bg) - len(list_intersect(bt.bg, br.bg))) AS j
              |      FROM cand JOIN bgt bt ON test_id = bt.doc_id JOIN bgt br ON train_id = br.doc_id)
              |SELECT test_id, count(*) AS n_train_matches, max(j) AS max_jaccard
              |FROM j WHERE j >= 0.8 GROUP BY test_id ORDER BY test_id""".stripMargin)
    ),

    // DC4: scrub the TRAIN side — the direction where volume lives. dc1/
    // dc2 probe the bounded test set against the train gram index; a
    // corpus release must also answer the converse: which TRAIN documents
    // carry eval-set content (they leak benchmark answers into the
    // model). At 100 TB the train side is the whole corpus, so the probe
    // is fronted by a BLOOM FILTER of the (bounded) test grams as a
    // codegen'd scan predicate — graft_bloom_might_contain, the explicit
    // form of the runtime-bloom join optimization — killing ~97% of
    // train gram rows inside the scan before any shuffle. The exact
    // semi-join against the distinct test grams then removes bloom false
    // positives, so the result is EXACTLY the unfiltered join's (the
    // oracle runs no bloom), and the bloom is pure pre-shuffle volume
    // reduction. Filter construction scans only the test split.
    Q(
      "dc4_train_scrub",
      (s, dir) => {
        GraftFunctions.register(s)
        val g = graft.CacheScope.track(
          grams(s, dir).persist(StorageLevel.MEMORY_AND_DISK))
        val testGrams = g.filter(col("split") === "test").select("g").distinct()
        val bloom = graft.functions.BloomMightContainLong
          .serializedBloom(testGrams, "g")
        g.filter(col("split") === "train")
          .filter(call_function(GraftFunctions.BloomName, col("g"), lit(bloom)))
          .join(testGrams, Seq("g"), "left_semi")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_leaked_grams"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $gramCte
              |SELECT g.doc_id, count(*) AS n_leaked_grams
              |FROM g JOIN (SELECT DISTINCT g FROM te) t ON g.g = t.g
              |WHERE g.split = 'train'
              |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin)
    )
  )
}
