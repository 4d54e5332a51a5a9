package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Entity resolution / record linkage: blocking join → pairwise
  * similarity score → threshold. The all-pairs comparison is quadratic
  * and never survives scale; every production linkage system cuts the
  * candidate space with BLOCKING — compare only pairs that agree on a
  * cheap deterministic key — then scores candidates with a string
  * similarity (here the native codegen
  * [[graft.functions.JaroWinklerSimilarity]], so
  * the scoring loop stays inside whole-stage codegen instead of a UDF).
  *
  * Scale shape: the blocking key is the join key, so candidates come
  * from an equi-join — never a cross join. Cost is Σ|block|², the
  * classic linkage tradeoff: pick keys that bound block size (first
  * token and language both do here). The expensive parts are spread
  * explicitly: the probe side is round-robined before the join (pair
  * MATERIALIZATION parallelism) and candidates are reshuffled by pair
  * before scoring (pair SCORING parallelism) — each in-code comment
  * below carries the measured serial-collapse it prevents.
  * Multi-pass blocking (rl2) unions candidates from two independent
  * keys before scoring — the standard recall fix for any single key's
  * blind spots — and dedups pairs BEFORE the expensive score so each
  * candidate is scored exactly once.
  */
object RecordLinkage {

  private def jw(a: Column, b: Column): Column =
    call_function(GraftFunctions.JaroWinklerName, a, b)

  /** Docs projected to (doc_id, head, block keys); head bounds the
    * per-pair score cost to O(80²) regardless of document length.
    */
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      substring(col("text"), 1, 80).as("head"),
      col("lang"),
      (col("n_chars") / 20).cast("long").as("len_bucket"),
      split(col("text"), " ").getItem(0).as("w1"))

  /** rl4's oracle weight columns: the six trained log-likelihood
    * ratios through [[graft.functions.LnExact]] — the same staged ln
    * the Spark side folds over the one-row aggregate.
    */
  private def rl4WeightCols: String =
    Seq("f1", "f2", "f3").flatMap { f =>
      val m = s"((${f}_m + 1.0)/(nm + 2.0))"
      val u = s"((${f}_u + 1.0)/(nn + 2.0))"
      Seq(
        graft.functions.LnExact.duckLp6Cols(s"($m / $u)", s"${f}_agree6"),
        graft.functions.LnExact.duckLp6Cols(
          s"((1.0 - $m) / (1.0 - $u))", s"${f}_dis6"))
    }.mkString(",\n    ")

  /** Score candidate pairs (must carry doc_a/head_a/doc_b/head_b), keep
    * those at or above `threshold`, round for oracle-stable output.
    *
    * The JW runs IN THE JOIN TASKS: the probe side of every caller's
    * blocking join is round-robined, so the pair stream (and the scoring
    * on it) is already spread across the full task fan-out — the
    * repartition-by-pair this used to do shuffled ~200 bytes of heads
    * per candidate (≈100 MB at sf0.1) only to re-establish a parallelism
    * the broadcast-probe shape already has (r16 decomposition: the
    * heads shuffle plus the sort-sampling's second JW pass were ~2/3 of
    * rl1's task-seconds). Survivors are persisted BEFORE the sort:
    * the filter keeps ≤ per-mille of candidates, so the persist is tiny
    * while guaranteeing the range-sampling pass never re-runs the JW
    * over the full candidate stream.
    */
  private def score(pairs: DataFrame, threshold: Double): DataFrame = {
    val scored = pairs
      .withColumn("sim", round(jw(col("head_a"), col("head_b")), 6))
      .filter(col("sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("sim"))
    graft.CacheScope.track(
        scored.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[Q] = Seq(
    Q(
      "rl1_blocked_linkage",
      (s, dir) => {
        GraftFunctions.register(s)
        val d = docs(s, dir)
        // The corpus arrives as one parquet split at this SF, and the
        // dim side broadcasts — so without a spread the ENTIRE
        // Σ|block|² pair materialization probes in a single task
        // (measured: 9 task-seconds at 9s wall). Round-robin the probe
        // side first: each task probes its share of docs against the
        // broadcast block table. At cluster scale the same shape holds
        // (broadcast the smaller deduped key table, spread the probe);
        // when neither side broadcasts this becomes a salted SMJ like
        // st2's.
        val n = s.sessionState.conf.numShufflePartitions
        val a = d.repartition(n)
          .select(col("doc_id").as("doc_a"), col("head").as("head_a"), col("w1"))
        val b = d.select(col("doc_id").as("doc_b"), col("head").as("head_b"), col("w1"))
        val cand = a.join(b, a("w1") === b("w1") && col("doc_a") < col("doc_b"))
        // The probe side is round-robined, so the broadcast-blocking
        // join emits each task's share of the Σ|block|² pairs locally —
        // scoring parallelism comes from the probe spread, not from a
        // pair reshuffle (the old repartition-by-pair moved every
        // candidate's two 80-char heads across the wire only to restore
        // a fan-out this shape already has; at cluster scale a salted
        // SMJ spreads the same way on the probe rows).
        score(cand, 0.9)
      },
      Some("""WITH d AS (SELECT doc_id, substr(text,1,80) AS head,
             |                  split_part(text,' ',1) AS w1 FROM documents)
             |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |       ROUND(jaro_winkler_similarity(a.head, b.head), 6) AS sim
             |FROM d a JOIN d b ON a.w1 = b.w1 AND a.doc_id < b.doc_id
             |WHERE ROUND(jaro_winkler_similarity(a.head, b.head), 6) >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin)),
    Q(
      "rl2_multipass_linkage",
      (s, dir) => {
        GraftFunctions.register(s)
        val d = docs(s, dir)
        val n = s.sessionState.conf.numShufflePartitions
        def side(suffix: String, keys: Seq[String]) =
          (if (suffix == "a") d.repartition(n) else d)
            .select((Seq(col("doc_id").as(s"doc_$suffix"),
              col("head").as(s"head_$suffix")) ++ keys.map(col)): _*)
        // pass 1: first token; pass 2: (lang, length bucket). Union THEN
        // distinct so overlapping candidates score once, not twice. The
        // heads ride THROUGH the distinct on purpose: an id-only dedup
        // with broadcast head re-attachment was tried in r16 and
        // measured 2.2× the task-seconds (the re-attach planned as two
        // extra sort-merge joins), while the head payload through the
        // exchange compresses to ~nothing (lz4 over a 40-word
        // vocabulary) — the distinct is also the exchange score()'s
        // sort-sampling pass reuses, so JW runs once.
        val p1 = side("a", Seq("w1")).join(side("b", Seq("w1")), "w1")
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "head_a", "doc_b", "head_b")
        val p2 = side("a", Seq("lang", "len_bucket"))
          .join(side("b", Seq("lang", "len_bucket")), Seq("lang", "len_bucket"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "head_a", "doc_b", "head_b")
        score(p1.union(p2).distinct(), 0.9)
      },
      Some("""WITH d AS (SELECT doc_id, substr(text,1,80) AS head, lang,
             |                  n_chars // 20 AS len_bucket,
             |                  split_part(text,' ',1) AS w1 FROM documents),
             |cand AS (
             |  SELECT a.doc_id AS doc_a, a.head AS head_a,
             |         b.doc_id AS doc_b, b.head AS head_b
             |  FROM d a JOIN d b ON a.w1 = b.w1 AND a.doc_id < b.doc_id
             |  UNION
             |  SELECT a.doc_id, a.head, b.doc_id, b.head
             |  FROM d a JOIN d b ON a.lang = b.lang
             |        AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id)
             |SELECT doc_a, doc_b,
             |       ROUND(jaro_winkler_similarity(head_a, head_b), 6) AS sim
             |FROM cand
             |WHERE ROUND(jaro_winkler_similarity(head_a, head_b), 6) >= 0.9
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // RL3: the entity-resolution COMPLETION — match pairs are only half
    // an ER system; the product is the golden record. rl1's blocked
    // matches become an undirected match graph, transitive closure
    // (pointer-jumped [[GraphOps.connectedComponents]] — A~B and B~C
    // merge even when A,C were never directly compared) groups docs
    // into entities, and each entity elects its golden member: most
    // content (max n_chars), smallest doc_id on ties — both
    // deterministic, so the whole pipeline stays engine-exact. Scale:
    // the closure runs on MATCH pairs (bounded by the linkage
    // threshold), never on the corpus; everything else is
    // key-partitioned joins/aggs on entity ids.
    Q(
      "rl3_golden_record",
      (s, dir) => {
        GraftFunctions.register(s)
        val d = docs(s, dir)
        val n = s.sessionState.conf.numShufflePartitions
        val a = d.repartition(n)
          .select(col("doc_id").as("doc_a"), col("head").as("head_a"), col("w1"))
        val b = d.select(col("doc_id").as("doc_b"), col("head").as("head_b"), col("w1"))
        val cand = a.join(b, a("w1") === b("w1") && col("doc_a") < col("doc_b"))
        val m = score(cand, 0.9) // probe-spread scoring; see score()
        val nodes = m.select(col("doc_a").as("node"))
          .unionByName(m.select(col("doc_b").as("node"))).distinct()
        val comp = GraphOps.connectedComponents(nodes,
          m.select(col("doc_a").as("src"), col("doc_b").as("dst")))
        val members = comp.join(
          Tables(s, dir, "documents")
            .select(col("doc_id").as("node"), col("n_chars")), "node")
        val sizes = members.groupBy(col("component").as("entity"))
          .agg(count(lit(1)).as("n_members"), max(col("n_chars")).as("max_chars"))
        val golden = members.join(sizes,
            members("component") === sizes("entity") &&
              members("n_chars") === sizes("max_chars"))
          .groupBy(col("entity")).agg(min(col("node")).as("golden_doc"))
        sizes.join(golden, "entity")
          .select(col("entity"), col("n_members"), col("max_chars"),
            col("golden_doc"))
          .orderBy("entity")
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, substr(text,1,80) AS head,
             |         split_part(text,' ',1) AS w1 FROM documents),
             |m AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             |  FROM d a JOIN d b ON a.w1 = b.w1 AND a.doc_id < b.doc_id
             |  WHERE ROUND(jaro_winkler_similarity(a.head, b.head), 6) >= 0.9),
             |e AS (SELECT doc_a AS src, doc_b AS dst FROM m
             |      UNION SELECT doc_b, doc_a FROM m),
             |nodes AS (SELECT DISTINCT src AS node FROM e),
             |reach(a, b) AS (
             |  SELECT node, node FROM nodes
             |  UNION
             |  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b),
             |lab AS (SELECT a AS node, CAST(min(b) AS BIGINT) AS entity
             |        FROM reach GROUP BY a),
             |mem AS (SELECT l.node, l.entity, doc.n_chars
             |        FROM lab l JOIN documents doc ON doc.doc_id = l.node),
             |sz AS (SELECT entity, CAST(count(*) AS BIGINT) AS n_members,
             |              CAST(max(n_chars) AS BIGINT) AS max_chars
             |       FROM mem GROUP BY entity)
             |SELECT s.entity, s.n_members, s.max_chars,
             |       CAST((SELECT min(node) FROM mem
             |             WHERE mem.entity = s.entity
             |               AND mem.n_chars = s.max_chars) AS BIGINT) AS golden_doc
             |FROM sz s ORDER BY entity""".stripMargin)),

    // RL4: Fellegi–Sunter probabilistic linkage — the TRAINED weights
    // tier above rl1's fixed threshold. A deterministic "clerically
    // reviewed" subset of the blocked candidates ((doc_a+doc_b)%3=0,
    // labeled match when the head similarity clears 0.95) estimates
    // each comparison field's m = P(agree|match) and u =
    // P(agree|non-match) with Laplace smoothing; unlabeled pairs then
    // score Σ_k ln(m/u) for agreeing fields and ln((1−m)/(1−u)) for
    // disagreeing ones, each weight fixed-point-rounded to a 1e-6 long
    // BEFORE the sum (tx14's discipline), link when the log-likelihood
    // ratio is ≥ 0. Training is ONE aggregate over the labeled pairs
    // (a 1-row m/u table broadcast back); scoring is a projection over
    // candidates — the same blocked-equi-join scale shape as rl1, with
    // the trained decision replacing the hand threshold.
    Q(
      "rl4_fellegi_sunter",
      (s, dir) => {
        GraftFunctions.register(s)
        val d = docs(s, dir)
        val n = s.sessionState.conf.numShufflePartitions
        val a = d.repartition(n).select(
          col("doc_id").as("doc_a"), col("head").as("head_a"),
          col("lang").as("lang_a"), col("len_bucket").as("lb_a"), col("w1"))
        val b = d.select(
          col("doc_id").as("doc_b"), col("head").as("head_b"),
          col("lang").as("lang_b"), col("len_bucket").as("lb_b"), col("w1"))
        // persisted: both the training aggregate and the scoring probe
        // consume `feat` — without the persist the Σ|block|² candidate
        // join materializes twice per run (CacheScope per repo rule).
        // The JW runs in the (round-robin-spread) join tasks and the
        // persist holds ids+booleans only — no pair reshuffle of head
        // text (see score()'s rationale).
        val feat = graft.CacheScope.track(
          a.join(b, a("w1") === b("w1") && col("doc_a") < col("doc_b"))
            .withColumn("sim", round(jw(col("head_a"), col("head_b")), 6))
            .select(
              col("doc_a"), col("doc_b"),
              (col("lang_a") === col("lang_b")).as("f1"),
              (col("lb_a") === col("lb_b")).as("f2"),
              (col("sim") >= 0.85).as("f3"),
              (col("sim") >= 0.95).as("is_match"),
              ((col("doc_a") + col("doc_b")) % 3 === 0).as("labeled"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        val fs = Seq("f1", "f2", "f3")
        val trainAggs =
          Seq(
            sum(when(col("is_match"), 1L).otherwise(0L)).as("nm"),
            sum(when(!col("is_match"), 1L).otherwise(0L)).as("nn")) ++
            fs.flatMap(f => Seq(
              sum(when(col(f) && col("is_match"), 1L).otherwise(0L)).as(s"${f}_m"),
              sum(when(col(f) && !col("is_match"), 1L).otherwise(0L)).as(s"${f}_u")))
        // trained log-likelihood-ratio weights through LnExact (the
        // libm-free ln): m, u are (0,1) by the +1/+2 smoothing, so
        // both ratios are strictly positive — six staged lns over a
        // ONE-row aggregate, fetched with a bounded single-row driver
        // fetch (the gr3/gradeMap/wq4 discipline; six longs, any scale)
        // and folded into the scoring projection as LITERALS. The old
        // crossJoin(broadcast(weights)) embedded a second scan of the
        // feat cache in the same action as the scoring scan, and AQE
        // materializes the two query stages CONCURRENTLY — both found
        // the cache unbuilt and each recomputed the full Σ|block|²
        // pair+JW stream (r17 Prof: two ~5 task-s heavy stages warm,
        // 32+10+9+9 cold). Sequencing via the eager fetch builds the
        // cache exactly once — matched Prof A/B at sf0.1/32: warm
        // task-s 14.4/17.1 -> 10.1/12.7, warm wall 2.8-3.0 -> 2.0-2.5;
        // cold run1 63.1 -> 57.6 task-s, wall 11.2 -> 9.7 (run1 is
        // generated-class JIT, paid once either way).
        val wRow = fs.foldLeft(
          feat.filter(col("labeled")).agg(trainAggs.head, trainAggs.tail: _*)) {
            (df, f) =>
              val m = (col(s"${f}_m") + lit(1.0)) / (col("nm") + lit(2.0))
              val u = (col(s"${f}_u") + lit(1.0)) / (col("nn") + lit(2.0))
              graft.functions.LnExact.withLp6(
                graft.functions.LnExact.withLp6(df, m / u, s"${f}_agree6"),
                (lit(1.0) - m) / (lit(1.0) - u), s"${f}_dis6")
          }
          .select(fs.flatMap(f =>
            Seq(col(s"${f}_agree6"), col(s"${f}_dis6"))): _*)
          .head()
        // null only if the labeled set is empty (agg over zero rows);
        // typed null literals reproduce the old null-weight flow-through
        def w(i: Int): Column =
          if (wRow.isNullAt(i)) lit(null).cast("long") else lit(wRow.getLong(i))
        val score6 = fs.zipWithIndex.map { case (f, i) =>
          when(col(f), w(2 * i)).otherwise(w(2 * i + 1))
        }.reduce(_ + _)
        feat.filter(!col("labeled"))
          .select(
            col("doc_a"), col("doc_b"), score6.as("score6"),
            (score6 >= 0L).as("linked"))
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH d AS (SELECT doc_id, substr(text,1,80) AS head, lang,
             |                  n_chars // 20 AS len_bucket,
             |                  split_part(text,' ',1) AS w1 FROM documents),
             |feat AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    a.lang = b.lang AS f1,
             |    a.len_bucket = b.len_bucket AS f2,
             |    ROUND(jaro_winkler_similarity(a.head, b.head), 6) >= 0.85 AS f3,
             |    ROUND(jaro_winkler_similarity(a.head, b.head), 6) >= 0.95 AS is_match,
             |    (a.doc_id + b.doc_id) % 3 = 0 AS labeled
             |  FROM d a JOIN d b ON a.w1 = b.w1 AND a.doc_id < b.doc_id),
             |tr AS (
             |  SELECT
             |    CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS nm,
             |    CAST(SUM(CASE WHEN NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS nn,
             |    CAST(SUM(CASE WHEN f1 AND is_match THEN 1 ELSE 0 END) AS BIGINT) AS f1_m,
             |    CAST(SUM(CASE WHEN f1 AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS f1_u,
             |    CAST(SUM(CASE WHEN f2 AND is_match THEN 1 ELSE 0 END) AS BIGINT) AS f2_m,
             |    CAST(SUM(CASE WHEN f2 AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS f2_u,
             |    CAST(SUM(CASE WHEN f3 AND is_match THEN 1 ELSE 0 END) AS BIGINT) AS f3_m,
             |    CAST(SUM(CASE WHEN f3 AND NOT is_match THEN 1 ELSE 0 END) AS BIGINT) AS f3_u
             |  FROM feat WHERE labeled),
             |w AS (
             |  SELECT
             |    $rl4WeightCols
             |  FROM tr)
             |SELECT doc_a, doc_b,
             |  (CASE WHEN f1 THEN f1_agree6 ELSE f1_dis6 END
             |   + CASE WHEN f2 THEN f2_agree6 ELSE f2_dis6 END
             |   + CASE WHEN f3 THEN f3_agree6 ELSE f3_dis6 END) AS score6,
             |  (CASE WHEN f1 THEN f1_agree6 ELSE f1_dis6 END
             |   + CASE WHEN f2 THEN f2_agree6 ELSE f2_dis6 END
             |   + CASE WHEN f3 THEN f3_agree6 ELSE f3_dis6 END) >= 0 AS linked
             |FROM feat CROSS JOIN w WHERE NOT labeled
             |ORDER BY doc_a, doc_b""".stripMargin)))
}
