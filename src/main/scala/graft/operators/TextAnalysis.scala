package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, heuristic language ID, and content fingerprinting.
  * Everything is per-row expression work (split / higher-order functions /
  * md5) — zero shuffle, so throughput is scan-bound at any scale; the only
  * shuffles below are the final deterministic ORDER BYs for the oracle
  * compare, which a production pipeline would drop.
  *
  * All derived numbers are ratios of exact integers (token counts, byte
  * lengths), so double results are bit-identical across engines.
  */
object TextAnalysis {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def stopwordSqlList = Stopwords.map(w => s"'$w'").mkString(", ")

  // Rabin–Karp rolling-hash parameters (tx6): h(w) = Σ c_j·B^(k-1-j) mod M
  // over each k-char window. Polynomial powers are plan-time constants so
  // per-window evaluation is a flat codegen'd sum in both engines.
  private val RollK = 8
  private val RollB = 257L
  private val RollM = 1000000007L
  private val RollPows: Seq[Long] =
    (0 until RollK).scanLeft(1L)((p, _) => p * RollB % RollM).take(RollK).reverse

  val all: Seq[Q] = Seq(
    // Token counting: whitespace tokens + chars-per-token.
    Q(
      "tx1_token_stats",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"),
            length(col("text")).as("len_chars"),
            (col("n_chars") === length(col("text"))).as("len_matches"))
          .withColumn(
            "chars_per_token",
            (col("len_chars") - (col("n_tokens") - 1)).cast("double") / col("n_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_tokens, len_chars,
             |  len_matches, CAST(len_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS chars_per_token
             |FROM (SELECT doc_id,
             |        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |        CAST(length(text) AS INT) AS len_chars,
             |        n_chars = length(text) AS len_matches
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)
    ),

    // Quality scoring: stopword ratio + length heuristics → {low,medium,high}.
    // Token+stopword tallies come from the native TokenStats expression
    // (one codegen'd byte pass; the size(split)+size(filter(...)) chain
    // it replaces materialized the token array twice and ran the
    // membership lambda interpreted — the wrong shape for a predicate
    // that reads every byte of the corpus).
    Q(
      "tx2_quality_score",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            call_function(graft.functions.GraftFunctions.TokenStatsName,
              col("text"), typedlit(Stopwords)).as("ts"))
          .select(
            col("doc_id"),
            col("ts.n_tokens").as("n_tokens"),
            col("ts.n_stop").as("n_stop"))
          .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
          .withColumn(
            "quality",
            when(col("n_tokens") < 20, "low")
              .when(col("stop_ratio") > 0.25, "low")
              .when(col("n_tokens") > 60, "high")
              .otherwise("medium"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, n_tokens, n_stop,
              |  CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
              |  CASE WHEN n_tokens < 20 THEN 'low'
              |       WHEN CAST(n_stop AS DOUBLE) / n_tokens > 0.25 THEN 'low'
              |       WHEN n_tokens > 60 THEN 'high'
              |       ELSE 'medium' END AS quality
              |FROM (SELECT doc_id,
              |        CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
              |        CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopwordSqlList))) AS INT) AS n_stop
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)
    ),

    // Heuristic language ID: English-stopword hits vs the labeled lang.
    // (A real n-gram model plugs into the same per-row shape.)
    Q(
      "tx3_lang_id",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            col("lang"),
            call_function(graft.functions.GraftFunctions.TokenStatsName,
              col("text"), typedlit(Stopwords)).getField("n_stop").as("en_hits"))
          .withColumn("predicted", when(col("en_hits") >= 3, "en").otherwise("unk"))
          .withColumn("agrees", col("predicted") === col("lang"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id, lang, en_hits,
              |  CASE WHEN en_hits >= 3 THEN 'en' ELSE 'unk' END AS predicted,
              |  (CASE WHEN en_hits >= 3 THEN 'en' ELSE 'unk' END) = lang AS agrees
              |FROM (SELECT doc_id, lang,
              |        CAST(len(list_filter(string_split(text, ' '), t -> t IN ($stopwordSqlList))) AS INT) AS en_hits
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)
    ),

    // BPE-ish regex tokenization: alpha runs / digit runs / single
    // punctuation as separate subword tokens — the pre-tokenizer shape a
    // byte-pair encoder consumes (vs tx1's whitespace tokens).
    Q(
      "tx5_regex_tokens",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)").as("sub"),
            size(split(col("text"), " ")).as("n_ws_tokens"))
          .select(
            col("doc_id"),
            size(col("sub")).as("n_subword_tokens"),
            size(array_distinct(col("sub"))).as("n_distinct_subwords"),
            col("n_ws_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_subword_tokens,
             |  CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS INT) AS n_distinct_subwords,
             |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Rolling-hash fingerprinting (Rabin–Karp over 8-char windows): the
    // winnowing building block — per-doc min window hash (a bottom-1
    // sample of the window-hash set, robust to edits outside the minimal
    // window) plus the distinct-window count. Uses the native
    // graft_rolling_hash expression: a TRUE incremental rolling update
    // in generated code — the SQL per-window polynomial form ran 25×
    // slower at sf0.1 (interpreted substring+ascii per window byte).
    Q(
      "tx6_rolling_fingerprint",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            call_function(graft.functions.GraftFunctions.RollingHashName,
              col("text"), lit(RollK), lit(RollB), lit(RollM)).as("wh"))
          .select(
            col("doc_id"),
            size(col("wh")).as("n_windows"),
            array_min(col("wh")).as("min_window_hash"),
            size(array_distinct(col("wh"))).as("n_distinct_windows"))
          .orderBy("doc_id")
      },
      Some(s"""SELECT doc_id,
              |  CAST(len(wh) AS INT) AS n_windows,
              |  list_min(wh) AS min_window_hash,
              |  CAST(len(list_distinct(wh)) AS INT) AS n_distinct_windows
              |FROM (SELECT doc_id,
              |        list_transform(generate_series(1, greatest(strlen(text) - ${RollK - 1}, 0)), i ->
              |          (${(0 until RollK).map(j =>
                         s"CAST(ascii(text[CAST(i + $j AS INT)]) AS BIGINT) * ${RollPows(j)}").mkString(" + ")}) % $RollM) AS wh
              |      FROM documents)
              |ORDER BY doc_id""".stripMargin)
    ),

    // Content fingerprinting: full-text hash + leading-shingle hash
    // (the cheap building blocks for incremental / prefix dedup).
    Q(
      "tx4_fingerprint",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            md5(col("text")).as("fp_full"),
            md5(concat_ws(" ", slice(split(col("text"), " "), 1, 5))).as("fp_head"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS fp_full,
             |  md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp_head
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // Repetition-based quality signal (the C4/Gopher duplicate-n-gram
    // heuristic): the fraction of bigram occurrences that are repeats of
    // an earlier bigram in the same document. Distinct counting rides the
    // native BigramMd5Hashes expression (sorted-distinct hashes in one
    // codegen'd pass), so the whole query is scan-bound with zero shuffle
    // — the shape a per-document quality filter must have at 100 TB.
    Q(
      "tx7_repetition",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            greatest(size(split(col("text"), " ")) - 1, lit(0)).cast("long")
              .as("n_bigrams"),
            size(call_function(graft.functions.GraftFunctions.BigramName, col("text")))
              .cast("long").as("n_distinct_bigrams"))
          .select(
            col("doc_id"),
            col("n_bigrams"),
            col("n_distinct_bigrams"),
            when(col("n_bigrams") > 0,
              round(lit(1.0) -
                col("n_distinct_bigrams").cast("double") / col("n_bigrams"), 6))
              .otherwise(lit(0.0)).as("dup_fraction"))
          .orderBy("doc_id")
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
             |b AS (SELECT doc_id,
             |        greatest(len(words) - 1, 0) AS n_bigrams,
             |        len(list_distinct(list_transform(generate_series(1, len(words) - 1),
             |          i -> CAST('0x' || substr(md5(words[i] || ' ' || words[i + 1]), 1, 8) AS BIGINT))))
             |          AS n_distinct_bigrams
             |      FROM w)
             |SELECT doc_id, n_bigrams, n_distinct_bigrams,
             |  CASE WHEN n_bigrams > 0
             |       THEN round(1 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6)
             |       ELSE 0.0 END AS dup_fraction
             |FROM b ORDER BY doc_id""".stripMargin)
    ),

    // PII detection/redaction — the scrub step a training corpus runs
    // before anything ships. The synthetic tables carry no literal PII,
    // so the query first RENDERS a deterministic contact string per
    // customer (email + phone derived from c_custkey by integer
    // arithmetic — identical in any engine), then runs the actual
    // operator under test: regex redaction with per-category counts.
    // Per-row regex work inside codegen, zero shuffle — the only shape
    // that survives a 100 TB scrub. Patterns are RE2-safe (character
    // classes + bounded repeats, no backrefs) so Java and DuckDB agree.
    Q(
      "tx8_pii_redact",
      (s, dir) => {
        val email = concat(lit("user"), col("c_custkey").cast("string"), lit("@example.com"))
        val phone = concat(
          (col("c_custkey") % 90 + 10).cast("string"), lit("-"),
          lpad(((col("c_custkey") * 7919) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("c_custkey") * 104729) % 1000).cast("string"), 3, "0"), lit("-"),
          lpad(((col("c_custkey") * 1299709) % 10000).cast("string"), 4, "0"))
        val profile = concat(
          lit("Contact "), col("c_name"), lit(" <"), email, lit("> or call "),
          phone, lit(" about "), col("c_mktsegment"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"
        Tables(s, dir, "customer")
          .select(
            col("c_custkey"),
            regexp_count(profile, lit(emailRe)).as("n_emails"),
            regexp_count(profile, lit(phoneRe)).as("n_phones"),
            regexp_replace(
              regexp_replace(profile, emailRe, "<EMAIL>"),
              phoneRe, "<PHONE>").as("redacted"))
          .orderBy("c_custkey")
      },
      Some("""WITH p AS (
             |  SELECT c_custkey,
             |    'Contact ' || c_name || ' <user' || CAST(c_custkey AS VARCHAR) ||
             |    '@example.com> or call ' ||
             |    CAST(c_custkey % 90 + 10 AS VARCHAR) || '-' ||
             |    lpad(CAST((c_custkey * 7919) % 1000 AS VARCHAR), 3, '0') || '-' ||
             |    lpad(CAST((c_custkey * 104729) % 1000 AS VARCHAR), 3, '0') || '-' ||
             |    lpad(CAST((c_custkey * 1299709) % 10000 AS VARCHAR), 4, '0') ||
             |    ' about ' || c_mktsegment AS profile
             |  FROM customer)
             |SELECT c_custkey,
             |  CAST(len(regexp_extract_all(profile, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(profile, '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
             |  regexp_replace(
             |    regexp_replace(profile, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
             |FROM p ORDER BY c_custkey""".stripMargin)
    ),

    // Token-length histogram — the corpus-shape diagnostic behind batch
    // sizing and truncation policy. Bucketing is per-row integer math
    // (no width_bucket: DuckDB lacks it), the aggregate is a 20-key
    // groupBy — partial map-side combine makes this a near-free full
    // scan at any corpus size.
    Q(
      "tx9_length_histogram",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(size(split(col("text"), " ")).as("n_tokens"))
          .withColumn("bucket",
            least(floor(col("n_tokens") / lit(10)), lit(19L)))
          .groupBy("bucket")
          .agg(
            count(lit(1)).as("n_docs"),
            min("n_tokens").as("min_tokens"),
            max("n_tokens").as("max_tokens"))
          .withColumn("bucket_lo", col("bucket") * 10)
          .orderBy("bucket"),
      Some("""SELECT bucket, count(*) AS n_docs,
             |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
             |  bucket * 10 AS bucket_lo
             |FROM (SELECT CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             |        least(CAST(floor(len(string_split(text, ' ')) / 10.0) AS BIGINT), 19) AS bucket
             |      FROM documents)
             |GROUP BY bucket ORDER BY bucket""".stripMargin)
    ),

    // TF-IDF-style salient terms: top-3 terms per document by
    // tf × (N/df) rarity. The damping log() usually applied to N/df is
    // floating point whose last ULP is libm-specific, so for
    // engine-exact results the score is the UNdamped ratio in fixed
    // point: tf·10⁶·N integer-DIV df — same ranking family, bit-exact
    // everywhere, ties broken lexicographically. Shape at scale: tf is
    // one shuffle on (doc, term), df one map-side-combined shuffle on
    // term, the df join is term-keyed (AQE broadcasts the vocabulary
    // when small), the corpus size joins as a 1-row cross, and top-3 is
    // a per-doc window — no driver-side anything.
    Q(
      "tx10_tfidf_terms",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables(s, dir, "documents")
        val tf = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(desc("score_fx"), asc("term"))
        tf.join(df, "term")
          .crossJoin(n)
          .withColumn("score_fx", expr("tf * 1000000 * n_docs DIV df"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select("doc_id", "term", "tf", "df", "score_fx", "rank")
          .orderBy("doc_id", "rank")
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
             |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, term, tf, df, score_fx, rank FROM (
             |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
             |    tf.tf * 1000000 * n.n_docs // dfx.df AS score_fx,
             |    CAST(row_number() OVER (PARTITION BY tf.doc_id
             |      ORDER BY tf.tf * 1000000 * n.n_docs // dfx.df DESC, tf.term) AS BIGINT) AS rank
             |  FROM tf JOIN dfx USING (term), n)
             |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
    ),

    // Gopher-style repetition/quality rule table (Rae et al. 2021,
    // "Scaling Language Models" §A1.1 — public filter heuristics): mean
    // word length in [3,10], ≥80% of words contain an alphabetic
    // character, symbol-to-word ratio (# and ellipsis) ≤ 0.1, ≥2
    // stopword hits, ≥10 words. Each metric is a ratio of exact integer
    // tallies (so the doubles are bit-identical across engines), the
    // whole rule table is one projection pass — at 100 TB this runs as
    // a scan predicate exactly like tx2's quality gate, and the flags
    // feed the corpus pipeline's quality stage.
    Q(
      "tx11_gopher_rules",
      (s, dir) => {
        val words = split(col("text"), " ")
        val nWords = size(words)
        val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]")))
        val nStop = size(filter(words, w => w.isInCollection(Stopwords)))
        val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
        val nEllipsis =
          (length(col("text")) - length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3
        Tables(s, dir, "documents")
          .select(
            col("doc_id"),
            nWords.as("n_words"),
            length(col("text")).as("len_chars"),
            nAlpha.as("n_alpha"),
            nStop.as("n_stop"),
            // nEllipsis is Column `/` (double) — exact (the diff is a
            // multiple of 3), so the int cast is lossless in both engines
            (nHash + nEllipsis).cast("int").as("n_symbols"))
          .select(
            col("doc_id"), col("n_words"), col("n_alpha"), col("n_stop"), col("n_symbols"),
            ((col("len_chars") - (col("n_words") - 1)).cast("double") / col("n_words"))
              .as("mean_word_len"),
            (col("n_alpha").cast("double") / col("n_words")).as("alpha_frac"),
            (col("n_symbols").cast("double") / col("n_words")).as("symbol_ratio"))
          .withColumn(
            "pass",
            col("mean_word_len").between(3.0, 10.0) &&
              col("alpha_frac") >= 0.8 &&
              col("symbol_ratio") <= 0.1 &&
              col("n_stop") >= 2 &&
              col("n_words") >= 10)
          .orderBy("doc_id")
      },
      Some(s"""WITH m AS (
              |  SELECT doc_id,
              |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
              |    CAST(length(text) AS INT) AS len_chars,
              |    CAST(len(list_filter(string_split(text, ' '),
              |      w -> regexp_matches(w, '[A-Za-z]'))) AS INT) AS n_alpha,
              |    CAST(len(list_filter(string_split(text, ' '),
              |      w -> w IN ($stopwordSqlList))) AS INT) AS n_stop,
              |    CAST((length(text) - length(replace(text, '#', '')))
              |      + (length(text) - length(replace(text, '...', ''))) / 3 AS INT) AS n_symbols
              |  FROM documents)
              |SELECT doc_id, n_words, n_alpha, n_stop, n_symbols,
              |  CAST(len_chars - (n_words - 1) AS DOUBLE) / n_words AS mean_word_len,
              |  CAST(n_alpha AS DOUBLE) / n_words AS alpha_frac,
              |  CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
              |  (CAST(len_chars - (n_words - 1) AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0)
              |    AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
              |    AND CAST(n_symbols AS DOUBLE) / n_words <= 0.1
              |    AND n_stop >= 2 AND n_words >= 10 AS pass
              |FROM m ORDER BY doc_id""".stripMargin)
    ),

    // HH1: exact vocabulary heavy hitters (tokens with ≥ 2% share) by
    // sketch + verify — the two-pass shape that works when the
    // vocabulary itself is too large to shuffle. Pass 1 aggregates a
    // 64-counter Misra–Gries sketch (custom mergeable
    // TypedImperativeAggregate, map-side partials like any built-in
    // agg) whose candidates PROVABLY superset every token above
    // 1/65 ≈ 1.5% < 2%; pass 2 exact-counts ONLY candidate tokens (a
    // broadcast 64-key join filters the explode), so the groupBy
    // shuffles O(sketch) keys, never O(vocabulary). The two passes cost
    // two scans; at 100 TB that beats one scan + a billion-key shuffle.
    // The verify pass makes the answer EXACT — the DuckDB oracle is the
    // plain exact query, not an error band.
    Q(
      "hh1_heavy_hitters",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val toks = Tables(s, dir, "documents")
          .select(explode(split(col("text"), " ")).as("tok"))
          .withColumn("h",
            conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
        val sketch = toks.agg(
          call_function(graft.functions.GraftFunctions.MisraGriesName,
            col("h"), lit(64)).as("mg"),
          count(lit(1)).as("n_tokens"))
        val cands = sketch
          .select(explode(col("mg")).as("c"), col("n_tokens"))
          .select(col("c.item").as("h"), col("n_tokens"))
        toks.join(broadcast(cands), Seq("h"))
          .groupBy(col("tok"), col("n_tokens"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") * 50 >= col("n_tokens"))
          .select(col("tok"), col("cnt"),
            expr("cnt * 10000 DIV n_tokens").as("share_bps"))
          .orderBy("tok")
      },
      Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
             |n AS (SELECT count(*) AS n_tokens FROM t),
             |c AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
             |SELECT tok, cnt, cnt * 10000 // n_tokens AS share_bps
             |FROM c, n WHERE cnt * 50 >= n_tokens ORDER BY tok""".stripMargin)
    ),

    // TX12: character-trigram profiles per language — the features a
    // production language identifier actually uses (word lists break on
    // unsegmented scripts; char n-grams don't). Top-5 trigrams per lang
    // by frequency. The explode is a per-row ×(len−2) projection (no
    // UDF: transform over an index sequence + substring), the count is
    // one map-side-combined shuffle on (lang, gram), top-5 is a bounded
    // per-lang window — the same shape as tx10's per-doc terms.
    Q(
      "tx12_char_trigrams",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // native one-pass gram expression (CharNgrams): the
        // transform-over-sequence chain it replaces runs interpreted
        // and re-walks the string per substr — O(len²) per row
        graft.functions.GraftFunctions.register(s)
        val counts = Tables(s, dir, "documents")
          .select(
            col("lang"),
            explode(call_function(
              graft.functions.GraftFunctions.CharNgramsName,
              col("text"), lit(3))).as("gram"))
          .groupBy("lang", "gram")
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("lang").orderBy(desc("n"), asc("gram"))
        counts
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 5)
          .select("lang", "rk", "gram", "n")
          .orderBy("lang", "rk")
      },
      Some("""WITH g AS (
             |  SELECT lang,
             |    unnest(list_transform(generate_series(1, length(text) - 2),
             |      i -> substr(text, i, 3))) AS gram
             |  FROM documents),
             |c AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY lang, gram)
             |SELECT lang, rk, gram, n FROM (
             |  SELECT lang, gram, n,
             |    CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS BIGINT) AS rk
             |  FROM c)
             |WHERE rk <= 5 ORDER BY lang, rk""".stripMargin)
    ),

    // TX13: per-document character entropy — the compression-proxy
    // quality signal (repetitive boilerplate reads low, noise reads
    // high; filters cut both tails). Native one-pass CharEntropy
    // expression (no per-char explode, no shuffle); DuckDB's entropy()
    // aggregate over exploded code points is the oracle. Both engines
    // round to 6 dp so summation-order ulps can't flip the compare;
    // the bucket column shows the filter-decision form.
    Q(
      "tx13_char_entropy",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        val ent = round(call_function(
          graft.functions.GraftFunctions.CharEntropyName, col("text")), 6)
        Tables(s, dir, "documents")
          .select(col("doc_id"), ent.as("char_entropy"))
          .withColumn("quality_band",
            when(col("char_entropy") < 3.5, "low")
              .when(col("char_entropy") > 5.5, "high")
              .otherwise("mid"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, round(ent, 6) AS char_entropy,
             |  CASE WHEN round(ent, 6) < 3.5 THEN 'low'
             |       WHEN round(ent, 6) > 5.5 THEN 'high'
             |       ELSE 'mid' END AS quality_band
             |FROM (
             |  SELECT doc_id, entropy(c) AS ent
             |  FROM (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
             |        FROM documents)
             |  GROUP BY doc_id)
             |ORDER BY doc_id""".stripMargin)
    ),

    // TX14: unigram log-probability scoring — the language-model
    // quality filter shape (CCNet's perplexity cut with the corpus's
    // own unigram model standing in for the external LM): P(t) =
    // corpus frequency, doc score = mean ln P(t) over its tokens; low
    // scores flag rare-token soup (boilerplate, code, mojibake).
    //
    // Determinism discipline: each token's ln P is rounded to 1e-6 and
    // summed as an INTEGER (order-free; a double mean would depend on
    // shuffle order), divided once at the end — the fixed-point mean
    // convention — and the ln ITSELF is [[graft.functions.LnExact]],
    // not libm (Java's and DuckDB's log differ by 1 ulp on ~0.03% of
    // inputs — measured — which makes a libm-backed 1e-6 rounding a
    // flaky cross-engine hash once a corpus evaluates billions of
    // distinct ratios; ev13 closed the same hole for pow). lp6 is
    // computed once per VOCABULARY entry (it depends only on c/t),
    // not per occurrence — at 100 TB that is the difference between
    // ln over |vocab| rows and ln over the corpus. Scale shape: one
    // explode of the corpus, a frequency table aggregated map-side,
    // the model join left to AQE (a real-corpus unigram table is
    // broadcast-sized after pruning; here it rides whatever AQE
    // picks), one per-doc aggregation.
    Q(
      "tx14_unigram_logprob",
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .filter(col("tok") =!= "")
        val freq = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        val total = freq.agg(sum("c").as("t"))
        val model = graft.functions.LnExact.withLp6(
          freq.crossJoin(total),
          col("c").cast("double") / col("t"), "lp6")
          .select("tok", "lp6")
        toks.join(model, "tok")
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_tok"),
            (sum(col("lp6")).cast("double") / 1000000.0 / count(lit(1)))
              .as("mean_logp"))
          .select(
            col("doc_id"), col("n_tok"),
            round(col("mean_logp"), 6).as("mean_logp"),
            (col("mean_logp") >= -4.0).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tk AS (
             |  SELECT doc_id, tok FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |    FROM documents)
             |  WHERE tok <> ''),
             |fr AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
             |tot AS (SELECT sum(c) AS t FROM fr),
             |fl AS (SELECT tok,
             |  ${graft.functions.LnExact.duckLp6Cols("(CAST(c AS DOUBLE) / t)", "lp6")}
             |  FROM fr CROSS JOIN tot),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS n_tok,
             |    CAST(SUM(lp6) AS DOUBLE) / 1000000.0 / count(*) AS mean_logp
             |  FROM tk JOIN fl USING (tok)
             |  GROUP BY doc_id)
             |SELECT doc_id, n_tok, ROUND(mean_logp, 6) AS mean_logp,
             |  mean_logp >= -4.0 AS keep
             |FROM sc ORDER BY doc_id""".stripMargin)
    ),

    // TX16: bigram CONDITIONAL-LM scoring — the step up from tx14's
    // unigram model toward the KenLM-style n-gram filters CCNet-class
    // pipelines actually run: P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V)
    // (Laplace over the successor distribution; c(w1,·) counts w1's
    // bigram starts so the conditional sums to 1). Bigrams come from
    // ONE per-doc window pass (lead over pos — row-local after a
    // single doc_id shuffle, never a corpus self-join); the count
    // model aggregates map-side; per-bigram log-probs are rounded to
    // 1e-6 longs before the per-doc sum (the tx14 discipline). Docs
    // with < 2 tokens have no bigrams and drop out — both engines
    // agree. At 100 TB the bigram model outgrows broadcast; the join
    // rides AQE on (w1, w2) keys exactly like dd7's gram joins.
    Q(
      "tx16_bigram_logprob",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // the ix* tier's tokenization, verbatim — one definition of
        // "occurrence" across retrieval and LM scoring
        val occ = InvertedIndex.occurrences(Tables(s, dir, "documents"))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val bigrams = occ
          .withColumn("w2", lead(col("tok"), 1).over(w))
          .filter(col("w2").isNotNull)
          .select(col("doc_id"), col("tok").as("w1"), col("w2"))
        val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        val c1 = c2.groupBy("w1").agg(sum("c2").as("c1"))
        val vocab = occ.agg(countDistinct(col("tok")).as("v"))
        // lp6 per MODEL entry (|bigram vocab| rows), via LnExact —
        // tx14's libm-free discipline and vocab-not-corpus ln count
        val model = graft.functions.LnExact.withLp6(
          c2.join(c1, "w1").crossJoin(broadcast(vocab)),
          (col("c2") + lit(1.0)) / (col("c1") + col("v")), "lp6")
          .select("w1", "w2", "lp6")
        bigrams
          .join(model, Seq("w1", "w2"))
          .groupBy("doc_id")
          .agg(
            count(lit(1)).as("n_bigrams"),
            (sum(col("lp6")).cast("double") / 1000000.0 / count(lit(1)))
              .as("mean_logp"))
          .select(
            col("doc_id"), col("n_bigrams"),
            round(col("mean_logp"), 6).as("mean_logp"),
            (col("mean_logp") >= -4.5).as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
             |occ AS (SELECT doc_id, pos, tok FROM (
             |  SELECT doc_id, CAST(unnest(range(1, len(l)+1)) AS INT) AS pos,
             |         unnest(l) AS tok FROM t)
             |  WHERE tok <> ''),
             |bg AS (SELECT doc_id, tok AS w1,
             |         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |       FROM occ),
             |bigrams AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
             |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY w1, w2),
             |c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY w1),
             |vv AS (SELECT count(DISTINCT tok) AS v FROM occ),
             |ml AS (SELECT w1, w2,
             |  ${graft.functions.LnExact.duckLp6Cols("((c2 + 1.0) / (c1 + v))", "lp6")}
             |  FROM c2 JOIN c1 USING (w1) CROSS JOIN vv),
             |sc AS (
             |  SELECT doc_id,
             |    CAST(count(*) AS BIGINT) AS n_bigrams,
             |    CAST(SUM(lp6) AS DOUBLE) / 1000000.0 / count(*) AS mean_logp
             |  FROM bigrams JOIN ml USING (w1, w2)
             |  GROUP BY doc_id)
             |SELECT doc_id, n_bigrams, ROUND(mean_logp, 6) AS mean_logp,
             |  mean_logp >= -4.5 AS keep
             |FROM sc ORDER BY doc_id""".stripMargin)
    ),

    // TX17: canonical text normalization via the native one-pass
    // [[graft.functions.NormalizeText]] expression (NFC + lowercase +
    // control-strip + whitespace-collapse — the stage before
    // tokenization/dedup so byte variants shingle identically). The
    // row perturbs each document into a messy variant (case flips,
    // leading/trailing runs, tabs) and proves normalization recovers
    // the canonical form; DuckDB recomputes with
    // nfc_normalize+lower+regexp. Non-ASCII semantics (combining
    // marks, unicode spaces) are pinned in NormalizeTextSpec — the
    // driver corpus is ASCII, where the engines provably agree.
    Q(
      "tx17_normalize_text",
      (s, dir) => {
        graft.functions.GraftFunctions.register(s)
        // pre-clean control bytes on BOTH engines: inside the 0x00-0x1f
        // / DEL range, Java's whitespace set (VT, FS..US) and RE2's \\s
        // disagree, so a regenerated corpus containing any control byte
        // would diverge native-vs-oracle; after the strip, the only
        // whitespace in play is {space, tab, newline}, where they agree
        val clean = regexp_replace(col("text"), "[\\x00-\\x1f\\x7f]", "")
        val messy = concat(
          lit("  "), upper(clean), lit(" \t "), clean, lit("\n"))
        Tables(s, dir, "documents")
          .select(
            col("doc_id"), clean.as("text"),
            call_function(graft.functions.GraftFunctions.NormalizeTextName,
              messy).as("norm"))
          .select(
            col("doc_id"),
            length(col("norm")).cast("long").as("n_chars"),
            (col("norm") === concat(col("text"), lit(" "), col("text")))
              .as("roundtrip"))
          .orderBy("doc_id")
      },
      Some("""WITH c AS (
             |  SELECT doc_id,
             |    regexp_replace(text, '[\x00-\x1f\x7f]', '', 'g') AS text
             |  FROM documents)
             |SELECT doc_id,
             |  length(trim(regexp_replace(lower(nfc_normalize(
             |    '  ' || upper(text) || ' ' || chr(9) || ' ' || text || chr(10))),
             |    '\s+', ' ', 'g'))) AS n_chars,
             |  trim(regexp_replace(lower(nfc_normalize(
             |    '  ' || upper(text) || ' ' || chr(9) || ' ' || text || chr(10))),
             |    '\s+', ' ', 'g')) = (text || ' ' || text) AS roundtrip
             |FROM c ORDER BY doc_id""".stripMargin)
    )
  )
}
