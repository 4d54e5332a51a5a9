package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed iterative graph analytics — PageRank as the flagship.
  *
  * Why this belongs in a training-data engine: link-graph authority is a
  * standard document-quality prior for web-scale corpus curation (crawl
  * frontiers and quality-weighted sampling both key on it), and it is
  * the canonical "iterative joins at scale" shape — the same loop
  * discipline as [[Dedup]]'s connected components (dd6).
  *
  * Design for 100 TB:
  *   - NO vertex-centric framework, no driver-side adjacency: each
  *     iteration is two shuffles (rank join on `src`, contribution
  *     aggregation on `dst`) that Catalyst plans like any other join —
  *     AQE broadcasts the rank side while it is small and falls back to
  *     sort-merge when it is not.
  *   - Lineage severed per iteration with eager `localCheckpoint` —
  *     without it the self-referential loop grows the analyzed plan
  *     geometrically (measured 20× post-loop planning blowup on dd6
  *     before severing; reliable `checkpoint()` is the cluster-grade
  *     swap-in for executor-loss recovery).
  *   - FIXED-POINT INTEGER arithmetic throughout (ranks are longs
  *     scaled by [[Scale]]): long sums are associative, so the result
  *     is bit-identical on any partitioning, any engine — float
  *     PageRank would drift with aggregation order and could never
  *     hash-match a second engine. Precision cost: one unit in 1e9 per
  *     floor, bounded by `iterations × 2` units total.
  *   - Fixed iteration count, no convergence probe: a delta-count per
  *     round is an extra action (and at web scale the norm is a fixed
  *     budget anyway); K is the caller's knob.
  *
  * Semantics: the classic damped walk. Per iteration each node keeps
  * `(1-d)/N` teleport mass plus `d ×` the sum of in-neighbour
  * contributions `rank(src) × w / outw(src)`. Mass on dangling nodes
  * (no out-edges) leaks — the variant that needs no global dangling
  * redistribution (an extra all-to-one aggregate per round); document
  * rankings are insensitive to it and the oracle mirrors it exactly.
  *
  * Overflow bounds (all longs): `rank ≤ Scale = 1e9`, so `rank × w`
  * needs `w ≤ 9.2e9` — per-edge multiplicity at any realistic corpus;
  * `damping × contrib ≤ 100 × Scale`.
  */
object GraphOps {

  /** Fixed-point denominator: rank 1.0 ≡ 1e9. */
  val Scale = 1000000000L

  /** Damped PageRank over an edge list.
    *
    * @param nodes      one `node: long` column, the full vertex set
    *                   (isolated vertices keep teleport mass only)
    * @param edges      `src, dst, w` (longs); parallel edges should be
    *                   pre-aggregated into `w`
    * @param iterations fixed number of damped-walk rounds
    * @param dampingPct damping factor in percent (85 ≡ the classic 0.85)
    * @return `node, rank` with `rank` the Scale-scaled long
    */
  def pageRank(
      nodes: DataFrame, edges: DataFrame,
      iterations: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")

    // vertex set and weighted out-degree are loop-invariant: compute
    // once, sever, reuse every round. The vertex count rides the
    // checkpoint job itself via `observe` — one job instead of
    // checkpoint + count (the clusterBands action-count discipline).
    val obs = org.apache.spark.sql.Observation()
    val v = nodes.select(col("node").cast("long").as("node"))
      .observe(obs, count(lit(1)).as("n"))
      .localCheckpoint(true)
    val outw = edges.groupBy("src").agg(sum("w").as("outw"))
    val e = edges.join(outw, "src")
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"),
        col("w").cast("long").as("w"), col("outw").cast("long").as("outw"))
      .localCheckpoint(true)

    val n = obs.get("n").asInstanceOf[Long]
    require(n > 0, "pageRank: empty vertex set")
    // at n >= Scale the initial rank Scale/n AND the teleport base
    // floor to zero, so every iteration emits all-zero ranks — a
    // uniform, useless result that would still hash-match the
    // identically-flooring oracle. Refuse instead of collapsing;
    // a graph that large needs a wider Scale.
    require(n < Scale,
      s"pageRank: $n vertices >= Scale=$Scale — integer ranks would " +
        "collapse to all zeros; widen Scale for a graph this large")
    val base = (Scale * (100 - dampingPct) / 100) / n

    var ranks = v.withColumn("rank", lit(Scale / n))
    for (r <- 0 until iterations) {
      // explicit dataset aliases (the shortestPaths discipline): on
      // un-severed rounds `ranks` contains e's subtree, so bare
      // e("dst")/e("w") would resolve only by join-leg order
      val contribs = e.as("e").join(ranks.as("r"), col("e.src") === col("r.node"))
        .select(col("e.dst").as("dst"), expr("(r.rank * e.w) div e.outw").as("c"))
        .groupBy("dst").agg(sum("c").as("c"))
      val next = v.join(contribs, v("node") === contribs("dst"), "left")
        .select(v("node"),
          (lit(base) + expr(s"($dampingPct * coalesce(c, 0L)) div 100"))
            .as("rank"))
      // Sever lineage every SECOND round, never the last (the caller's
      // materialization severs it): each round references `ranks` ONCE,
      // so the un-severed plan grows linearly (two joins + one agg per
      // round) and a two-round-deep plan recomputes nothing — while a
      // fixed-round loop's tail is driver-job-bound, so halving the
      // checkpoint jobs halves that cost (the clusterBands discipline;
      // measured at sf0.1/32: per-round 3.3s wall vs stride-2 2.9s,
      // identical 1.7 task-s).
      ranks =
        if (r < iterations - 1 && r % 2 == 1) next.localCheckpoint(true)
        else next
    }
    ranks
  }

  /** Undirected connected components: `node, component` with
    * `component` = the smallest node id in the component (a canonical,
    * partitioning-independent label — no floats, no randomness, so the
    * result hash-matches any engine's transitive closure).
    *
    * Hash-min label propagation with POINTER JUMPING: each round first
    * takes the min label over neighbours (one edge⋈label shuffle + one
    * agg), then compresses paths by relabelling through the label's own
    * label (`label ← label(label)`, one self-join) — the combination
    * converges in O(log n) rounds on any topology where plain
    * min-propagation needs O(diameter) (a 1M-node path: ~20 rounds vs
    * 1M). Same loop discipline as [[pageRank]] and dd6: per-round
    * `localCheckpoint` severs the self-referential lineage, and the
    * convergence probe is a bounded `limit(1).count` existence check,
    * not a full materialization.
    *
    * Edges are symmetrized and deduped internally; the vertex set is
    * `nodes` ∪ both edge endpoints, so dangling edge endpoints cannot
    * orphan a label lookup and isolated vertices come back as singleton
    * components.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIterations: Int = 50): DataFrame = {
    val ends = edges.select(col("src").cast("long").as("node"))
      .unionByName(edges.select(col("dst").cast("long").as("node")))
    val v = nodes.select(col("node").cast("long").as("node"))
      .unionByName(ends).distinct().localCheckpoint(true)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .unionByName(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)

    var labels = v.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var round = 0
    var converged = false
    while (!converged && round < maxIterations) {
      // 1) neighbour min: the smallest label any in-neighbour carries
      val nbr = e.join(labels, e("src") === labels("node"))
        .groupBy(e("dst").as("n2")).agg(min("label").as("nl"))
      // the round-START label rides along as `old` so the convergence
      // count needs no third join back onto `labels` — it compares the
      // jumped label against the carried column in the same rows
      val stepped = labels.join(nbr, labels("node") === nbr("n2"), "left")
        .select(labels("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // 2) pointer jump: follow the label one hop (labels are node ids,
      // and every label value is a node in v, so the lookup is total)
      val l2 = stepped.select(col("node").as("jn"), col("label").as("jl"))
      // convergence count rides the checkpoint job via `observe` — one
      // job per round instead of checkpoint + a separate count (the
      // clusterBands discipline; the tail rounds of a fixed point are
      // driver-round-trip-bound, not data-bound)
      val obs = org.apache.spark.sql.Observation()
      val jumped = stepped.as("a").join(l2.as("j"), col("a.label") === col("j.jn"))
        .observe(obs, coalesce(sum(when(col("j.jl") =!= col("a.old"), 1L)
          .otherwise(0L)), lit(0L)).as("changed"))
        .select(col("a.node").as("node"), col("j.jl").as("label"))
        .localCheckpoint(true)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = jumped
      round += 1
    }
    // the canonical-label contract (component = smallest node id) only
    // holds at a fixed point — returning a non-converged labeling
    // would silently split entities downstream (rl3's golden-record
    // grouping keys on it)
    require(converged,
      s"connectedComponents: not converged after $maxIterations rounds; " +
        "raise maxIterations")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Single-source shortest paths, FIXED-ROUND Bellman-Ford: after
    * `rounds` relaxations the result is exactly `min cost over paths of
    * ≤ rounds hops` — a deterministic quantity whether or not the
    * distances have converged, which is what makes an engine-exact
    * oracle possible (the DuckDB mirror unrolls the identical integer
    * relaxation; no convergence probe, no float drift). Costs are LONG
    * edge weights summed exactly.
    *
    * Each round is one dist⋈edges shuffle + one min-agg — the same
    * two-shuffle discipline as [[pageRank]], lineage severed per round.
    * Unreachable-within-`rounds` nodes are absent from the result (no
    * sentinel infinities to overflow).
    */
  def shortestPaths(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val spark = edges.sparkSession
    import spark.implicits._
    var dist = Seq((source, 0L)).toDF("node", "dist").localCheckpoint(true)
    for (r <- 0 until rounds) {
      // dataset aliases, not bare column refs: on un-severed rounds
      // `dist` already CONTAINS e's subtree, so e("dst")/e("w") would
      // be ambiguous self-join references
      val relaxed = dist.as("d").join(e.as("e"), col("d.node") === col("e.src"))
        .select(col("e.dst").as("node"), (col("d.dist") + col("e.w")).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      // stride-2 severing, never the last round — `dist` is referenced
      // twice per round (union + join) but both arms sit under one agg
      // exchange the sampling reuses; see pageRank's stride note
      dist =
        if (r < rounds - 1 && r % 2 == 1) next.localCheckpoint(true)
        else next
    }
    dist
  }

  /** Fixed-round k-core peel: `rounds` iterations of "drop every node
    * with degree < k, then drop its edges". After full convergence the
    * survivors are exactly the k-core; after a FIXED round count they
    * are a deterministic superset — the same exactness-without-a-probe
    * deal as [[shortestPaths]], which is what gives it an engine-exact
    * unrolled oracle. Returns `(node, degree)` over the surviving
    * subgraph's edges.
    *
    * Each round is one degree aggregation plus two semi-joins of the
    * edge list against the surviving-node set — all key-partitioned
    * shuffles, no driver data, lineage severed per round like the other
    * fixed-point loops. At 100 TB the edge list re-shuffles by the same
    * key every round, so AQE/bucketing keeps the exchange reusable;
    * rounds is small (most peels converge in a handful) and each round
    * strictly shrinks the data.
    *
    * `edges` must be undirected pairs; symmetrized and deduped here.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .unionByName(edges.select(col("dst").cast("long").as("src"),
        col("src").cast("long").as("dst")))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint(true)
    for (r <- 1 to rounds) {
      // symmetric edge list ⇒ degree = out-degree. `keep` is referenced
      // by both semi-joins, but its subtree ends in the degree agg's
      // exchange, which Spark reuses across the two references
      // (ReusedExchange) — no checkpoint needed; severing `e` every
      // second round (never the last) bounds plan depth while dropping
      // half the per-round driver jobs (see pageRank's stride note).
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      val next = e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select("src", "dst")
      e = if (r < rounds && r % 2 == 0) next.localCheckpoint(true) else next
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** One unrolled peel round as oracle SQL — the exact mirror of the
    * loop body in [[kCore]].
    */
  private def kcIterSql(i: Int, k: Int): String =
    s"""v$i AS (SELECT src AS node FROM e${i - 1}
       |        GROUP BY src HAVING count(*) >= $k),
       |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
       |        JOIN v$i a ON e.src = a.node
       |        JOIN v$i b ON e.dst = b.node)""".stripMargin

  /** One unrolled relaxation round as oracle SQL — the exact integer
    * mirror of the loop body in [[shortestPaths]].
    */
  private def spIterSql(i: Int): String =
    s"""d$i AS (
       |  SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM (
       |    SELECT node, dist FROM d${i - 1}
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + e.w AS dist
       |    FROM d${i - 1} p JOIN edges e ON e.src = p.node)
       |  GROUP BY node)""".stripMargin

  /** gr1's round count and damping — ONE constant pair interpolated
    * into BOTH the Spark call and the oracle unroll, so the two
    * engines cannot drift when either knob is tuned (the same
    * interpolation rule gr6 applies to its cap).
    */
  private val PrRounds = 5
  private val PrDampingPct = 85

  /** gr3 / gr5's fixed round (and core-k) knobs — same
    * single-constant-interpolated-into-both-engines rule as
    * [[PrRounds]]: the Spark call and the oracle unroll can't drift.
    */
  private val SpRounds = 6
  private val KcRounds = 3
  private val KcK = 3

  /** One unrolled damped-walk round as oracle SQL — MUST stay the exact
    * integer-arithmetic mirror of the loop body above (same operation
    * order, same floor divisions), or the bit-identical guarantee dies.
    * The teleport numerator `(Scale*(100-d))/100` is precomputed in
    * SCALA (DuckDB would evaluate 1000000000 * 15 in INT32 and
    * overflow), and the damping percent interpolates from the same
    * constant the Spark call uses.
    */
  private def prIterSql(i: Int, dampingPct: Int = PrDampingPct): String = {
    val tele = Scale * (100 - dampingPct) / 100
    s"""r$i AS (
       |  SELECT n.node,
       |         $tele // (SELECT n FROM nn)
       |           + ($dampingPct * COALESCE(s.c, 0)) // 100 AS rank
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst, CAST(SUM((r.rank * e.w) // o.outw) AS BIGINT) AS c
       |    FROM edges e
       |    JOIN r${i - 1} r ON r.node = e.src
       |    JOIN outw o ON o.src = e.src
       |    GROUP BY e.dst) s ON s.dst = n.node)""".stripMargin
  }


  /** gr6's per-customer pair-fanout cap (top-N items before pairing). */
  private val CoPurchaseCap = 10

  val all: Seq[Q] = Seq(
    // GR1: authority over the session-transition graph. Nodes are the
    // event payload keys (`props.k`), edges the per-user consecutive
    // transitions between them (lag over (ts, event_id)), weighted by
    // transition count — the events stream read as a browsing graph.
    // Five damped rounds; oracle unrolls the identical integer loop.
    Q(
      "gr1_pagerank",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("node"))
          .filter(col("node").isNotNull)
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev
          .withColumn("src", lag("node", 1).over(byTime))
          .filter(col("src").isNotNull)
          .select(col("src"), col("node").as("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        pageRank(ev.select("node").distinct(), edges,
          iterations = PrRounds, dampingPct = PrDampingPct)
          .select(col("node"), col("rank").as("rank_fp"))
          .orderBy("node")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, ts, event_id,
              |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
              |  FROM events
              |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
              |trans AS (
              |  SELECT node AS dst,
              |         lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
              |  FROM ev),
              |edges AS (
              |  SELECT src, dst, CAST(count(*) AS BIGINT) AS w
              |  FROM trans WHERE src IS NOT NULL GROUP BY src, dst),
              |nodes AS (SELECT DISTINCT node FROM ev),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
              |outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
              |         FROM edges GROUP BY src),
              |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nn) AS rank
              |       FROM nodes),
              |${(1 to PrRounds).map(prIterSql(_)).mkString(",\n")}
              |SELECT node, rank AS rank_fp FROM r$PrRounds ORDER BY node""".stripMargin)
    ),

    // GR2: undirected components of the RECURRING-transition graph —
    // edges are session transitions seen ≥5 times (the threshold keeps
    // habitual navigation paths and drops one-off hops, leaving a
    // multi-component graph at this corpus). Component labels are min
    // node ids, so the DuckDB transitive-closure oracle hash-matches
    // exactly; the Spark side never materializes a closure — hash-min +
    // pointer jumping is O(E log N) total work.
    Q(
      "gr2_components",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("node"))
          .filter(col("node").isNotNull)
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev
          .withColumn("src", lag("node", 1).over(byTime))
          .filter(col("src").isNotNull)
          .groupBy(col("src"), col("node").as("dst"))
          .agg(count(lit(1)).as("w"))
          .filter(col("w") >= 5)
          .select("src", "dst")
        connectedComponents(ev.select("node").distinct(), edges)
          .orderBy("node")
      },
      Some("""WITH RECURSIVE ev AS (
             |  SELECT user_id, ts, event_id,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS node
             |  FROM events
             |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |trans AS (
             |  SELECT node AS dst,
             |         lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
             |  FROM ev),
             |e0 AS (SELECT src, dst FROM trans WHERE src IS NOT NULL
             |       GROUP BY src, dst HAVING count(*) >= 5),
             |edges AS (SELECT src, dst FROM e0 WHERE src <> dst
             |          UNION SELECT dst, src FROM e0 WHERE src <> dst),
             |nodes AS (SELECT DISTINCT node FROM ev),
             |reach(a, b) AS (
             |  SELECT node, node FROM nodes
             |  UNION
             |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b)
             |SELECT a AS node, CAST(min(b) AS BIGINT) AS component
             |FROM reach GROUP BY a ORDER BY node""".stripMargin)
    ),

    // GR3: hop distances (unit-weight SSSP) from the smallest node of
    // the transition graph, 6 fixed Bellman-Ford rounds — "how many
    // clicks from the entry page", the navigation-depth read of the
    // session graph. Fixed rounds make the answer exact without a
    // convergence probe; the oracle unrolls the identical relaxation.
    Q(
      "gr3_shortest_paths",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("node"))
          .filter(col("node").isNotNull)
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev
          .withColumn("src", lag("node", 1).over(byTime))
          .filter(col("src").isNotNull && col("src") =!= col("node"))
          .select(col("src"), col("node").as("dst")).distinct()
          .withColumn("w", lit(1L))
        // single aggregated row — bounded driver fetch; min over zero
        // rows is NULL, and getLong on it would be a bare NPE
        val srcRow = ev.agg(min("node")).head()
        require(!srcRow.isNullAt(0),
          "gr3: no event carries props.k — the session graph is empty")
        val source = srcRow.getLong(0)
        shortestPaths(edges, source, rounds = SpRounds)
          .orderBy("node")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, ts, event_id,
              |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
              |  FROM events
              |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
              |trans AS (
              |  SELECT node AS dst,
              |         lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
              |  FROM ev),
              |edges AS (
              |  SELECT DISTINCT src, dst, CAST(1 AS BIGINT) AS w
              |  FROM trans WHERE src IS NOT NULL AND src <> dst),
              |d0 AS (SELECT (SELECT min(node) FROM ev) AS node,
              |              CAST(0 AS BIGINT) AS dist),
              |${(1 to SpRounds).map(spIterSql).mkString(",\n")}
              |SELECT node, dist FROM d$SpRounds ORDER BY node""".stripMargin)
    ),

    // GR4: triangle census + global clustering coefficient of the
    // undirected transition graph. The scale design is DEGREE-ORDERED
    // ORIENTATION (the standard trick): orient every undirected edge
    // from its lower-(degree, id) endpoint to the higher, so each
    // triangle is counted exactly once AND the wedge join's fan-out per
    // node is bounded by the oriented out-degree — O(E^1.5) total work
    // and no hub-node quadratic blow-up, where the naive shared-center
    // join explodes on the highest-degree vertex. The oracle counts the
    // same triangles from the canonical u<v edge list; wedge totals are
    // Σ C(deg, 2) on both sides.
    Q(
      "gr4_triangles",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("node"))
          .filter(col("node").isNotNull)
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // und feeds five consumers (wedges twice, closing, degree stats,
        // edge count): EAGER localCheckpoint cuts the expensive subtree
        // — the full event scan + per-user window + distinct — to ONE
        // derivation before the main job; everything downstream is O(E)
        // rows. Measured at sf0.1/32 cores: lazy persist() 6.6s at 162
        // task-s (the five branches' stages race to compute the
        // not-yet-cached IMR partitions in parallel), unpersisted 3.0s,
        // eager checkpoint 2.0s at 0.7 task-s — the same loop
        // discipline gr1-gr3 use.
        val und = (ev
          .withColumn("prev", lag("node", 1).over(byTime))
          .filter(col("prev").isNotNull && col("prev") =!= col("node"))
          .select(
            least(col("prev"), col("node")).as("u"),
            greatest(col("prev"), col("node")).as("v"))
          .distinct()
          .localCheckpoint(true))
        val deg = und.select(col("u").as("node"))
          .unionAll(und.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("deg"))
        // orient u→v when (deg(u), u) < (deg(v), v); carry the head
        // endpoint's (deg, id) so the wedge join can order its two arms
        // without another lookup
        val du = deg.select(col("node").as("u"), col("deg").as("du"))
        val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
        val oriented = und.join(du, "u").join(dv, "v")
          .select(
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("u"))
              .otherwise(col("v")).as("src"),
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("v"))
              .otherwise(col("u")).as("dst"),
            when(col("du") < col("dv") ||
              (col("du") === col("dv") && col("u") < col("v")), col("dv"))
              .otherwise(col("du")).as("ddst"))
        val o1 = oriented.select(col("src"), col("dst").as("a"), col("ddst").as("da"))
        val o2 = oriented.select(col("src"), col("dst").as("b"), col("ddst").as("db"))
        // wedge (src; a, b) with a <ₒ b in the orientation order; the
        // closing edge a→b is oriented the same way by transitivity
        val wedges = o1.join(o2, Seq("src"))
          .filter(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")))
          .select(col("a"), col("b"))
        val closing = oriented.select(col("src").as("a"), col("dst").as("b"))
        val tri = wedges.join(closing, Seq("a", "b"), "left_semi")
          .agg(count(lit(1)).as("n_triangles"))
        val stats = deg.agg(
          count(lit(1)).as("n_nodes"),
          // integer `div`, not `/`: Spark's Divide promotes to DOUBLE,
          // and past 2^53 wedges the 53-bit mantissa drops low-order
          // bits the oracle's exact `// 2` keeps — a silent hash
          // mismatch at hub degrees ~1e8
          expr("sum(deg * (deg - 1)) div 2").as("n_wedges"))
        val edgeCount = und.agg(count(lit(1)).as("n_edges"))
        stats.crossJoin(edgeCount).crossJoin(tri)
          .select(
            col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
            round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
              .as("clustering"))
      },
      Some("""WITH ev AS (
             |  SELECT user_id, ts, event_id,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS node
             |  FROM events
             |  WHERE json_extract_string(props, '$.k') IS NOT NULL),
             |trans AS (
             |  SELECT node AS dst,
             |         lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
             |  FROM ev),
             |edges AS (
             |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
             |  FROM trans WHERE src IS NOT NULL AND src <> dst),
             |deg AS (
             |  SELECT node, CAST(count(*) AS BIGINT) AS deg
             |  FROM (SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
             |  GROUP BY node),
             |tri AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
             |  FROM edges e1
             |  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
             |  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v)
             |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
             |       (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
             |       (SELECT CAST(SUM(deg * (deg - 1)) // 2 AS BIGINT) FROM deg) AS n_wedges,
             |       (SELECT n_triangles FROM tri) AS n_triangles,
             |       ROUND(3.0 * (SELECT n_triangles FROM tri) /
             |             (SELECT SUM(deg * (deg - 1)) // 2 FROM deg), 6) AS clustering
             |""".stripMargin)
    ),

    // GR5: k-core extraction (k=3, 3 peel rounds) over the undirected
    // transition graph — the dense backbone the periphery hangs off,
    // the standard graph-cleanup step before community/influence work.
    // Fixed rounds keep the answer engine-exact (gr3's trick); the
    // oracle unrolls the identical peel.
    Q(
      "gr5_kcore",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("node"))
          .filter(col("node").isNotNull)
        val byTime = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val edges = ev
          .withColumn("src", lag("node", 1).over(byTime))
          .filter(col("src").isNotNull && col("src") =!= col("node"))
          .select(col("src"), col("node").as("dst")).distinct()
        kCore(edges, k = KcK, rounds = KcRounds).orderBy("node")
      },
      Some(s"""WITH ev AS (
              |  SELECT user_id, ts, event_id,
              |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS node
              |  FROM events
              |  WHERE json_extract_string(props, '$$.k') IS NOT NULL),
              |trans AS (
              |  SELECT node AS dst,
              |         lag(node) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
              |  FROM ev),
              |und AS (SELECT DISTINCT src, dst FROM trans
              |        WHERE src IS NOT NULL AND src <> dst),
              |e0 AS (SELECT src, dst FROM und
              |       UNION SELECT dst, src FROM und),
              |${(1 to KcRounds).map(kcIterSql(_, KcK)).mkString(",\n")}
              |SELECT src AS node, CAST(count(*) AS BIGINT) AS degree
              |FROM e3 GROUP BY src ORDER BY node""".stripMargin)
    ),

    // GR6: bipartite projection with hot-node capping — the
    // co-purchase matrix (customer×part → part–part co-counts), the
    // item-item backbone of every "customers also bought" recommender.
    // The scale trap is the per-user quadratic pair fanout: one
    // customer with 10k purchases alone contributes 50M pairs. The
    // standard fix — cap each user's contribution to their TOP-N items
    // BEFORE pairing (deterministic: count desc, partkey asc) — bounds
    // fanout at N(N−1)/2 pairs per customer regardless of skew, and
    // the oracle proves the capped projection exactly. Shapes: one
    // (cust, part) map-side-combined count, one bounded per-cust
    // window, one self-equi-join on cust (never all-pairs), one pair
    // count, TakeOrdered top-20.
    Q(
      "gr6_copurchase_projection",
      (s, dir) => {
        val capN = CoPurchaseCap
        // NO fact-side spread: tried in r16 and reverted — the probe +
        // (cust, part) partial count is too cheap per row for a
        // round-robin to pay (wall 3.79 -> 3.01 but task-s 7.1 -> 20.2
        // in the matched A/B; the low-core sweep keys on task-s)
        val bought = Tables(s, dir, "lineitem")
          .join(Tables(s, dir, "orders"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("cust").orderBy(desc("cnt"), asc("part"))
        val capped = bought
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= capN)
          .select("cust", "part")
        val a = capped.select(col("cust"), col("part").as("part_a"))
        val b = capped.select(col("cust"), col("part").as("part_b"))
        a.join(b, Seq("cust"))
          .filter(col("part_a") < col("part_b"))
          .groupBy("part_a", "part_b")
          .agg(count(lit(1)).as("co_customers"))
          .orderBy(desc("co_customers"), asc("part_a"), asc("part_b"))
          .limit(20)
      },
      // the cap is interpolated so the two engines cannot drift
      Some(s"""WITH bought AS (
              |  SELECT o_custkey AS cust, l_partkey AS part, count(*) AS cnt
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY 1, 2),
              |capped AS (
              |  SELECT cust, part FROM (
              |    SELECT cust, part,
              |      row_number() OVER (PARTITION BY cust ORDER BY cnt DESC, part ASC) AS rk
              |    FROM bought)
              |  WHERE rk <= $CoPurchaseCap)
              |SELECT a.part AS part_a, b.part AS part_b,
              |  CAST(count(*) AS BIGINT) AS co_customers
              |FROM capped a JOIN capped b ON a.cust = b.cust AND a.part < b.part
              |GROUP BY 1, 2
              |ORDER BY co_customers DESC, part_a ASC, part_b ASC LIMIT 20""".stripMargin)
    )
  )
}
