package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication operators for large-scale training-data pipelines:
  * exact, MinHash+LSH, SimHash, and n-gram Jaccard (the embedding-cosine
  * near-dup lives in Similarity.scala, sharing the hyperplane-LSH machinery).
  *
  * Scale design: signature computation (MinHash, SimHash) is expressed with
  * per-row higher-order functions over the token array — zero shuffle, scan
  * speed, embarrassingly parallel at any data size. The only shuffles are the
  * LSH band-bucket self-join (the standard way to avoid the O(n²) all-pairs
  * comparison) and the final candidate-pair verification join. Hash functions
  * are md5-derived so signatures are deterministic and portable across
  * engines (the DuckDB oracles recompute them bit-for-bit).
  */
object Dedup {

  private val NumHashes = 16 // minhash signature width
  // 2 bands of 8 hashes → high-precision banding aimed at J ≳ 0.9 near-dups.
  // This corpus is unusually self-similar (small synthetic vocabulary, median
  // pairwise J ≈ 0.65), so wider bands keep the candidate set ~0.04% of n²
  // instead of ~50%; on a natural-text corpus narrower bands raise recall.
  private val BandSize = 8

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Distinct word shingles of a document. */
  private val tokensCol: Column = array_distinct(split(col("text"), " "))

  /** Per-row MinHash signature: sig[i] = min over tokens of md5(i ++ ":" ++ t).
    * Computed entirely inside the row — no explode, no shuffle.
    */
  private val sigArr: Column =
    transform(
      sequence(lit(0), lit(NumHashes - 1)),
      i => array_min(transform(tokensCol, t => md5(concat(i.cast("string"), lit(":"), t)))))

  /** Per-doc band signatures: (doc_id, band, sig) with sig the ","-join of
    * that band's minhashes in seed order.
    */
  private def bandSigs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        posexplode(transform(
          sequence(lit(0), lit(NumHashes / BandSize - 1)),
          b => concat_ws(",", slice(sigArr, b * BandSize + 1, lit(BandSize))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("sig"))

  /** Candidate near-dup pairs: docs sharing any full band signature.
    * This is the LSH bucket join — shuffle on (band, sig), never all-pairs.
    */
  private def lshCandidates(s: SparkSession, dir: String): DataFrame = {
    val b = bandSigs(s, dir)
    b.as("a")
      .join(b.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  // ---- shared DuckDB oracle CTEs (recompute the same md5-based LSH) ----

  private val mhSql =
    s"""toks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |mh AS (SELECT doc_id, seed, min(md5(CAST(seed AS VARCHAR) || ':' || token)) AS minhash
       |       FROM toks CROSS JOIN range($NumHashes) t(seed) GROUP BY doc_id, seed)""".stripMargin

  private val candSql =
    s"""$mhSql,
       |sigs AS (SELECT doc_id, CAST(seed // $BandSize AS INT) AS band,
       |                string_agg(minhash, ',' ORDER BY seed) AS sig
       |         FROM mh GROUP BY doc_id, band),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM sigs a JOIN sigs b
       |           ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)""".stripMargin

  val all: Seq[Q] = Seq(
    // Exact dedup: hash-groupBy on content, keep the smallest id.
    Q(
      "dd1_exact_dedup",
      (s, dir) =>
        docs(s, dir)
          .groupBy(col("text"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("copies"))
          .select("keep_id", "copies", "text")
          .orderBy("keep_id"),
      Some("""SELECT min(doc_id) AS keep_id, count(*) AS copies, text
             |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin)
    ),

    // MinHash signatures, one row per (doc, seed) — the building block.
    Q(
      "dd2_minhash_signatures",
      (s, dir) =>
        docs(s, dir)
          .select(col("doc_id"), posexplode(sigArr))
          .select(col("doc_id"), col("pos").cast("long").as("seed"), col("col").as("minhash"))
          .orderBy("doc_id", "seed"),
      Some(s"""WITH $mhSql
              |SELECT doc_id, seed, minhash FROM mh ORDER BY doc_id, seed""".stripMargin)
    ),

    // LSH banding: candidate pairs sharing a band bucket.
    Q(
      "dd3_lsh_candidates",
      (s, dir) =>
        lshCandidates(s, dir).orderBy("doc_a", "doc_b"),
      Some(s"""WITH $candSql
              |SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // Candidate verification: exact word-shingle Jaccard on LSH candidates
    // only (array_intersect per pair — the pair list is tiny relative to n²).
    Q(
      "dd4_jaccard_neardup",
      (s, dir) => {
        val toks = docs(s, dir)
          .select(col("doc_id"), tokensCol.as("toks"), size(tokensCol).as("n"))
        lshCandidates(s, dir)
          .join(toks.as("ta"), col("doc_a") === col("ta.doc_id"))
          .join(toks.as("tb"), col("doc_b") === col("tb.doc_id"))
          // materialize the intersection size once per pair — it's the hot
          // expression (hash-set probe over both arrays)
          .select(
            col("doc_a"),
            col("doc_b"),
            size(array_intersect(col("ta.toks"), col("tb.toks"))).as("inter"),
            col("ta.n").as("na"),
            col("tb.n").as("nb"))
          .select(
            col("doc_a"),
            col("doc_b"),
            (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH $candSql,
              |tk AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks FROM documents)
              |SELECT doc_a, doc_b, jaccard FROM (
              |  SELECT doc_a, doc_b,
              |    CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) /
              |      (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))) AS jaccard
              |  FROM cand JOIN tk ta ON doc_a = ta.doc_id JOIN tk tb ON doc_b = tb.doc_id)
              |WHERE jaccard >= 0.8 ORDER BY doc_a, doc_b""".stripMargin)
    ),

    // SimHash: 16-bit fingerprint from the token multiset, all integer math
    // (md5-derived 32-bit token hashes), computed per-row with no shuffle.
    Q(
      "dd5_simhash",
      (s, dir) =>
        docs(s, dir)
          .withColumn(
            "hashes",
            expr("transform(split(text, ' '), t -> CAST(conv(substr(md5(t),1,8),16,10) AS BIGINT))"))
          .select(
            col("doc_id"),
            expr(
              """aggregate(transform(sequence(0,15), j ->
                |  CASE WHEN aggregate(hashes, 0L, (acc, h) ->
                |         acc + CASE WHEN (h div shiftleft(CAST(1 AS BIGINT), j)) % 2 = 1 THEN 1 ELSE -1 END) > 0
                |       THEN shiftleft(CAST(1 AS BIGINT), j) ELSE CAST(0 AS BIGINT) END),
                | CAST(0 AS BIGINT), (acc, b) -> acc + b)""".stripMargin).as("simhash"))
          .orderBy("doc_id"),
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
             |h AS (SELECT doc_id, CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS hv FROM tok),
             |bits AS (SELECT doc_id, j,
             |    CASE WHEN SUM(CASE WHEN (hv // (1::BIGINT << j)) % 2 = 1 THEN 1 ELSE -1 END) > 0
             |         THEN (1::BIGINT << j) ELSE 0 END AS bitval
             |  FROM h CROSS JOIN range(16) t(j) GROUP BY doc_id, j)
             |SELECT doc_id, CAST(SUM(bitval) AS BIGINT) AS simhash
             |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    )
  )
}
