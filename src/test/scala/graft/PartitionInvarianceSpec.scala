package graft

/** Partitioning-independence: the repo's determinism claims (fixed-point
  * money sums, scaled-integer ranks, id tie-breaks) say results are
  * IDENTICAL under any parallelism — the property that lets a 32-thread
  * local run and a 1000-executor cluster hash-match the same oracle.
  * Run determinism-sensitive queries under three shuffle-partition
  * settings and require row-identical output.
  */
class PartitionInvarianceSpec extends SparkSpec {

  // float aggregation order (q2), window ranks + top-k (q7), LSH band
  // grouping (dd5), salted two-phase agg (st1), fixed-point pagerank
  // (gr1), funnel shortlist (ss4), HLL sketch merge order (dp2), the
  // one-pass flag-aggregated funnel over the cluster fixed point (cp1),
  // quantized-log PSI sums + datasketches HLL union order (dp4, ap3)
  private val Sensitive = Seq(
    "q2_avg_order_value",
    "q7_customer_leaderboard",
    "dd5_simhash",
    "st1_salted_agg",
    "gr1_pagerank",
    "ss4_ivfpq_topk",
    "dp2_approx_profile",
    "cp1_corpus_accounting",
    "dp4_drift_profile",
    "ap3_sketch_rollup",
    // fixed-point NB log-sums + smallest-label argmax tie-break
    "nb1_naive_bayes",
    // min_by/max_by composite-key tie-break + fixed-point volume
    "ev11_ohlc_bars",
    // Count-Min partial-sketch merge (exact elementwise addition)
    "cm1_countmin_probe",
    // fixed-point BM25 contributions + top-20 doc_id tie-break
    "ix3_bm25_search",
    // quantized n^alpha terms make the normalizer an exact integer sum
    "sp6_temperature_weights",
    // per-doc lead() bigrams + fixed-point conditional log-prob mean
    "tx16_bigram_logprob",
    // total-ordered ntile banding + fixed-point band totals
    "wf3_ntile_deciles",
    // trained m/u weights from one agg + fixed-point LLR sums
    "rl4_fellegi_sunter",
    // integer floor-division interpolation over window carries
    "ev12_gapfill_interp",
    // one-fold delta-join bootstrap: multiset m-fold must not depend
    // on how the signed changelog partitions
    "iv3_join_view",
    // DV-applied read: the anti-join against the delete vector must
    // drop exactly the recorded coordinates under any parallelism
    "tt18_mor_delete",
    // Morton-key quantization + box pruning: the rewrite's layout may
    // shift with parallelism but the read answer must not
    "tt22_zorder_box_read",
    // multiplicity fold + support-table aggregation: distinct counts
    // must not depend on how the changelog partitions
    "iv7_distinct_view")

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
    df.collect().map(_.toString).toSeq
  }

  test("sensitive queries are row-identical under 1, 5, and 32 shuffle partitions") {
    val key = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(key)
    try {
      val results = Seq("1", "5", "32").map { n =>
        spark.conf.set(key, n)
        spark.catalog.clearCache()
        n -> Sensitive.map(q => q -> rows(q)).toMap
      }
      val (refN, ref) = results.head
      for ((n, got) <- results.tail; q <- Sensitive) {
        assert(got(q) === ref(q),
          s"$q differs between $refN and $n shuffle partitions")
        assert(got(q).nonEmpty, s"$q returned no rows")
      }
    } finally {
      spark.conf.set(key, orig)
      spark.catalog.clearCache()
    }
  }
}
