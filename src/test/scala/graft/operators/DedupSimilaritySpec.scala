package graft.operators

import graft.{SparkSpec, TestSpark}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** Quality/scale properties of the dedup and ANN operators that the
  * DuckDB hash-compare can't express: recall against the exact baseline,
  * candidate-set precision, cluster-output linearity, and the native
  * expressions' algebra.
  */
class DedupSimilaritySpec extends SparkSpec {

  private val dir = TestSpark.Sf0001
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  // exact all-pairs Jaccard >= 0.9 at sf0.001 (50 docs -> 1225 pairs)
  private lazy val exactPairs: Set[(Long, Long)] = {
    val tk = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("toks"))
    tk.as("a").join(tk.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id"), col("b.doc_id"),
        (size(array_intersect(col("a.toks"), col("b.toks"))).cast("double") /
          size(array_union(col("a.toks"), col("b.toks")))).as("j"))
      .filter(col("j") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("dd4 near-dup recall >= 0.85 vs exact all-pairs Jaccard at the 0.9 threshold") {
    val got = q("dd4_jaccard_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exactPairs), "no false positives: dd4 verifies exactly")
    val recall = got.size.toDouble / math.max(exactPairs.size, 1)
    assert(recall >= 0.85, s"recall $recall of ${exactPairs.size} true pairs")
  }

  test("dd3 candidate set contains every dd4 survivor and stays near the true-pair scale") {
    val cand = q("dd3_lsh_candidates")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = q("dd4_jaccard_neardup")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cand))
    // banding selectivity: candidates may exceed true pairs (the corpus is
    // dense below threshold) but must stay within a small constant of them,
    // never O(n^2)-all-pairs
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val allPairs = n * (n - 1) / 2
    assert(cand.size < allPairs * 0.6, s"${cand.size} of $allPairs pairs")
  }

  test("dd6 cluster assignment is linear: one row per doc, canonical reps are self-mapped") {
    val clusters = q("dd6_dup_clusters").cache()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(clusters.count() === n)
    assert(clusters.filter("cluster_rep > doc_id").count() === 0,
      "reps never point forward")
    assert(clusters.filter("is_canonical AND cluster_rep != doc_id").count() === 0)
    // one-pass label propagation: rep chains strictly decrease, so
    // pointer-chasing must terminate at a canonical doc in few hops
    val repOf = clusters.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    repOf.keys.foreach { d =>
      var cur = d
      var hops = 0
      while (repOf(cur) != cur && hops < 50) { cur = repOf(cur); hops += 1 }
      assert(repOf(cur) === cur, s"chain from $d did not terminate")
      assert(hops <= 10, s"chain from $d took $hops hops")
    }
  }

  test("fixed-point clustering reaches the true connected components of the bucket graph") {
    val cc = Dedup.clusterDocuments(spark, dir).cache()
    // every LSH candidate pair must share a final cluster
    val cand = q("dd3_lsh_candidates")
    val labels = cc.select(col("doc_id"), col("cluster_rep"))
    val unmerged = cand
      .join(labels.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("cluster_rep", "ra"), Seq("doc_a"))
      .join(labels.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("cluster_rep", "rb"), Seq("doc_b"))
      .filter(col("ra") =!= col("rb"))
      .count()
    assert(unmerged === 0, "connected docs must share a cluster at the fixed point")
    // reps are true fixed points: every rep is canonical
    val reps = cc.select(col("cluster_rep")).distinct()
    val canon = cc.filter("is_canonical").select(col("doc_id").as("cluster_rep"))
    assert(reps.exceptAll(canon).count() === 0)
  }

  test("maintained ANN index equals a rebuild, including a re-embed upsert") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_annidx")
      .resolve("log").toString
    def vecs(ids: Seq[Long], salt: Int) = ids.map { i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7 + salt) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    // initial build, an extension batch, then a RE-EMBED of id 2 (the
    // merge's WHEN MATCHED arm: the stored index row must be replaced)
    SnapshotLog.append(spark, root, Similarity.indexRows(spark, vecs(0L to 5L, 0), 4))
    SnapshotLog.mergeInto(spark, root,
      Similarity.indexRows(spark, vecs(6L to 9L, 0), 4), Seq("vec_id"))
    SnapshotLog.mergeInto(spark, root,
      Similarity.indexRows(spark, vecs(Seq(2L), 9), 4), Seq("vec_id"))
    val rebuilt = Similarity.indexRows(spark,
      vecs(Seq(2L), 9).unionByName(vecs((0L to 9L).filter(_ != 2L), 0)), 4)
    assert(rowSet(SnapshotLog.read(spark, root)) === rowSet(rebuilt))
  }

  test("ss2 ANN is a faithful subset search: scores exact, ranks correct within candidates") {
    // On this isotropic corpus (max pairwise cosine ~0.48) recall tracks
    // the probed fraction by construction — the >=0.9-recall contract is
    // exercised on planted-neighbor data in SimilarityRecallSpec. Here:
    // every ANN hit must carry the exact brute-force score.
    val exact = q("ss1_cosine_topk")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val ann = q("ss2_ann_lsh_topk")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(ann.nonEmpty)
    ann.foreach { case (pair, score) =>
      exact.get(pair).foreach(es => assert(es === score, s"score mismatch for $pair"))
    }
  }

  test("native sorted-intersect expression matches array_intersect semantics") {
    GraftFunctions.register(spark)
    val df = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  sort_array(array(5L, 1L, 9L, 7L)), sort_array(array(9L, 2L, 5L, 11L))) AS c,
        |  graft_sorted_intersect_count(array(1L), array(2L)) AS zero,
        |  graft_sorted_intersect_count(array(), CAST(array() AS ARRAY<BIGINT>)) AS empty""".stripMargin)
    val r = df.head()
    assert(r.getInt(0) === 2 && r.getInt(1) === 0 && r.getInt(2) === 0)
  }

  test("native dot product matches the interpreted higher-order computation") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |  aggregate(zip_with(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D),
        |    (x, y) -> x * y), 0.0D, (a, x) -> a + x) AS ref""".stripMargin).head()
    assert(r.getDouble(0) === r.getDouble(1))
    assert(r.getDouble(0) === 32.0)
  }

  test("dedup signatures are reused, not recomputed, across the self-join") {
    // the signature table is persisted: both sides of the LSH self-join
    // must resolve to the same cached plan (one InMemoryRelation, two scans)
    val plan = q("dd3_lsh_candidates").queryExecution.optimizedPlan
    val cached = plan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(cached.nonEmpty, "the signature pipeline reads from the cache")
    assert(cached.map(_.cacheBuilder.cachedPlan).distinct.size === 1,
      "all cache reads resolve to the same entry")
  }
}
