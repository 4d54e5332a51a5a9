package graft.operators

import graft.SparkSpec
import graft.operators.GraphOps.{pageRank, Scale}

/** Closed-form and invariant checks for the fixed-point PageRank loop.
  * Expected values are hand-derived with the SAME integer floor
  * arithmetic the operator defines (base = floor(floor(0.15·S)/N);
  * contribution = floor(rank·w/outw); damped = floor(85·c/100)) — the
  * point is bit-exactness, not approximate agreement.
  */
class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ranksOf(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)],
      iters: Int): Map[Long, Long] =
    pageRank(nodes.toDF("node"), edges.toDF("src", "dst", "w"), iters)
      .as[(Long, Long)].collect().toMap

  test("two-node chain matches hand-computed fixed-point values") {
    // A -> B. N=2: init = 5e8 each, base = floor(15e7/2) = 75e6.
    // Iter 1: A gets base only; B gets base + floor(85 * 5e8 / 100).
    val r1 = ranksOf(Seq(1L, 2L), Seq((1L, 2L, 1L)), iters = 1)
    assert(r1(1L) == 75000000L)
    assert(r1(2L) == 75000000L + 85L * 500000000L / 100L)
    // Iter 2: B's inflow is iter-1 A = base.
    val r2 = ranksOf(Seq(1L, 2L), Seq((1L, 2L, 1L)), iters = 2)
    assert(r2(1L) == 75000000L)
    assert(r2(2L) == 75000000L + 85L * 75000000L / 100L)
  }

  test("weighted out-edges split mass proportionally with floor division") {
    // A -> B (w=3), A -> C (w=1); N=3: init = 333333333, base = 5e7.
    // contrib(B) = floor(init*3/4), contrib(C) = floor(init*1/4).
    val init = Scale / 3
    val r = ranksOf(Seq(1L, 2L, 3L),
      Seq((1L, 2L, 3L), (1L, 3L, 1L)), iters = 1)
    assert(r(2L) == 50000000L + 85L * (init * 3L / 4L) / 100L)
    assert(r(3L) == 50000000L + 85L * (init * 1L / 4L) / 100L)
    assert(r(1L) == 50000000L)
  }

  test("2-cycle converges to equal ranks and conserves mass within floor loss") {
    val r = ranksOf(Seq(1L, 2L), Seq((1L, 2L, 1L), (2L, 1L, 1L)), iters = 8)
    assert(r(1L) == r(2L)) // symmetric graph, symmetric fixed point
    // each round loses at most a few units to floors; 8 rounds × 2 nodes
    val total = r.values.sum
    assert(total <= Scale && total >= Scale - 100L,
      s"mass $total drifted outside the floor-loss band")
  }

  test("isolated and dangling nodes hold exactly the teleport base") {
    // 1 -> 2; 3 isolated. Dangling node 2 keeps no outflow (leak), but
    // its own NEXT rank is still base; isolated 3 is base every round.
    val r = ranksOf(Seq(1L, 2L, 3L), Seq((1L, 2L, 1L)), iters = 3)
    val base = 150000000L / 3L
    assert(r(1L) == base)
    assert(r(3L) == base)
    assert(r(2L) == base + 85L * base / 100L) // inflow from 1's base rank
  }

  private def compsOf(
      nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.connectedComponents(
      nodes.toDF("node"), edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("connected components label by min id across paths, cycles, and isolates") {
    // path 1-2-3-4 (directed arbitrarily), cycle 10-11-12, isolate 20,
    // dangling endpoint 30 appearing only in an edge
    val comps = compsOf(
      nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L),
      edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L),
        (12L, 10L), (30L, 31L)))
    assert(comps === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("connected components converge on a long path (pointer jumping, not diameter)") {
    // a 64-node path has diameter 63; hash-min alone would need 63
    // rounds — the maxIterations=50 default only converges because the
    // pointer jump compresses paths logarithmically
    val n = 64L
    val comps = compsOf(
      nodes = (0L until n),
      edges = (1L until n).map(i => (i - 1, i)))
    assert(comps.values.toSet === Set(0L))
    // and is invariant under edge direction + partitioning
    val flipped = GraphOps.connectedComponents(
      (0L until n).toDF("node").repartition(7),
      (1L until n).map(i => (i, i - 1)).toDF("src", "dst").repartition(5))
      .as[(Long, Long)].collect().toMap
    assert(flipped === comps)
  }

  test("fixed-round shortest paths take the cheaper route and respect the hop budget") {
    // 1→2 (cost 10), 1→3 (1), 3→2 (2): best 1→2 is via 3, cost 3.
    // 2→4 (1): reachable only with ≥3 rounds. 5 is unreachable.
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L), (2L, 4L, 1L))
      .toDF("src", "dst", "w")
    val d3 = GraphOps.shortestPaths(edges, source = 1L, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(d3 === Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 4L))
    // with 2 rounds, 4 is reached only via the expensive direct edge
    // (1→2 in round 1, 2→4 in round 2): dist = 11, not yet the optimum
    val d2 = GraphOps.shortestPaths(edges, source = 1L, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(d2(4L) === 11L)
    assert(d2(2L) === 3L)
    // 0 rounds: just the source
    assert(GraphOps.shortestPaths(edges, 1L, 0)
      .as[(Long, Long)].collect().toMap === Map(1L -> 0L))
  }

  test("result is deterministic across repeated runs and repartitionings") {
    val edges = (0L until 200L).map(i => (i % 17L, (i * 7L) % 17L, 1L + i % 3L))
    val nodes = (0L until 17L)
    val a = ranksOf(nodes, edges, iters = 4)
    val b = pageRank(nodes.toDF("node").repartition(7),
      edges.toDF("src", "dst", "w").repartition(5), 4)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  private def kcoreOf(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    GraphOps.kCore(edges.toDF("src", "dst"), k, rounds)
      .as[(Long, Long)].collect().toMap

  test("kCore peels pendants and keeps the dense core") {
    // triangle 1-2-3 with pendant chain 3-4, 4-5: k=2 drops 5 (deg 1)
    // in round 1, then 4 (its remaining deg 1) in round 2; the
    // triangle survives at degree 2 each
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(kcoreOf(tri, k = 2, rounds = 3) ===
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // one round only: 5 is gone, 4 still present with its edge to 3
    val r1 = kcoreOf(tri, k = 2, rounds = 1)
    assert(r1(4L) === 1L && r1(3L) === 3L)
  }

  test("kCore fixed rounds are a deterministic superset of the converged core") {
    // 4-clique + a long tail: the clique is the 3-core; the tail peels
    // one node per round, so round counts differ but never disagree on
    // surviving-node degrees they both report
    val clique = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val tail = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val r2 = kcoreOf(clique ++ tail, k = 3, rounds = 2)
    val r5 = kcoreOf(clique ++ tail, k = 3, rounds = 5)
    assert(r5 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    r5.keys.foreach(n => assert(r2.contains(n)))
  }
}
