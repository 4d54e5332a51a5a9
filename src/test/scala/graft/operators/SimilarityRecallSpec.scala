package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** ANN recall on data with REAL neighbor structure: each query vector has
  * a planted twin at cosine ≥ 0.99. At that similarity a hyperplane
  * agrees with probability ≈ 0.97, so the twin lands within Hamming ≤ 1
  * of the query's 8-bit bucket ≈ 98% of the time — the multi-probe
  * search must find it. (On the isotropic testdata corpus recall is
  * bounded by the probed fraction for any index — that regime is covered
  * in DedupSimilaritySpec.)
  */
class SimilarityRecallSpec extends SparkSpec {

  test("multi-probe ANN finds >= 0.9 of planted near-duplicate twins") {
    import spark.implicits._
    val rnd = new Random(7)
    val nQueries = 60
    val dims = 64

    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }

    // queries 0..59; twin of query q is vec_id 1000+q = base + 3% noise;
    // plus 400 unrelated random vectors
    val bases = (0 until nQueries).map(_ => Array.fill(dims)(rnd.nextGaussian()))
    val rows =
      bases.zipWithIndex.map { case (b, i) => (i.toLong, unit(b)) } ++
        bases.zipWithIndex.map { case (b, i) =>
          (1000L + i, unit(b.map(_ + 0.03 * rnd.nextGaussian())))
        } ++
        (0 until 400).map(i => (2000L + i, unit(Array.fill(dims)(rnd.nextGaussian()))))

    val raw = rows.toDF("vec_id", "embedding")
    val v = Similarity.prepare(spark, raw)
    val found = Similarity.annTopK(v, nQueries, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val hits = (0 until nQueries).count(q => found.get(q.toLong).contains(1000L + q))
    val recall = hits.toDouble / nQueries
    assert(recall >= 0.9, s"planted-twin recall $recall ($hits/$nQueries)")

    // sanity: exact search agrees that the twin IS the top-1
    val exact = Similarity.bruteTopK(v, nQueries, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactHits = (0 until nQueries).count(q => exact.get(q.toLong).contains(1000L + q))
    assert(exactHits === nQueries, "every twin is the true nearest neighbor")

    // IVF path: a twin at cosine ~0.995 lands in the query's own or
    // runner-up centroid cell almost always — nprobe=2 must find most.
    val ivf = Similarity.ivfTopK(v, nQueries, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivfHits = (0 until nQueries).count(q => ivf.get(q.toLong).contains(1000L + q))
    val ivfRecall = ivfHits.toDouble / nQueries
    assert(ivfRecall >= 0.8, s"IVF planted-twin recall $ivfRecall ($ivfHits/$nQueries)")

    // Full IVF+PQ+re-rank funnel (ss4's operator): the twin must both
    // survive the PQ shortlist (a near-identical vector codes to the
    // same or adjacent codewords, so its asymmetric-distance score
    // ranks near the top) AND win the exact re-rank. The funnel can
    // only lose twins the plain IVF probe already lost, plus shortlist
    // misses — so its recall is bounded by ivfRecall and must stay
    // within a small margin of it.
    val funnel = Similarity.ivfPqTopK(v, nQueries, topK = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fHits = (0 until nQueries).count(q => funnel.get(q.toLong).contains(1000L + q))
    val fRecall = fHits.toDouble / nQueries
    assert(fRecall >= ivfRecall - 0.1,
      s"funnel planted-twin recall $fRecall vs IVF $ivfRecall")
    assert(fRecall >= 0.75, s"funnel planted-twin recall $fRecall ($fHits/$nQueries)")
  }

  /** Trained IVF: on data with CLUSTER structure, k-means centroids
    * align cells with the clusters, so a query's own cell holds its true
    * neighbors; the fixed md5-derived centroids cut clusters along
    * arbitrary hyperplane boundaries and scatter members across cells
    * beyond the nprobe=2 budget. Same operator, same nprobe — the
    * centroid quality is the only variable.
    */
  test("k-means-trained IVF beats the untrained index at equal nprobe on clustered data") {
    import spark.implicits._
    val rnd = new Random(13)
    val dims = 64
    val nClusters = 16
    val perCluster = 25
    val nQueries = nClusters

    val centers = (0 until nClusters).map(_ => Array.fill(dims)(4.0 * rnd.nextGaussian()))
    def member(c: Array[Double]): Array[Float] =
      c.map(x => (x + rnd.nextGaussian()).toFloat)
    // queries 0..15: one member per cluster; corpus 1000+: the rest
    val rows =
      centers.zipWithIndex.map { case (c, i) => (i.toLong, member(c)) } ++
        centers.zipWithIndex.flatMap { case (c, i) =>
          (0 until perCluster).map(j => (1000L + i * perCluster + j, member(c)))
        }
    val raw = rows.toDF("vec_id", "embedding")

    def recallOf(found: Array[org.apache.spark.sql.Row],
        truth: Map[Long, Set[Long]]): Double =
      found.groupBy(_.getLong(0)).map { case (q, rs) =>
        rs.map(_.getLong(1)).toSet.intersect(truth(q)).size.toDouble / 3
      }.sum / nQueries

    val v = Similarity.prepare(spark, raw)
    val truth = Similarity.bruteTopK(v, nQueries, topK = 3)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val untrained = recallOf(Similarity.ivfTopK(v, nQueries, topK = 3).collect(), truth)
    v.unpersist()

    val cents = Similarity.trainCentroids(raw)
    val vT = Similarity.prepareTrained(spark, raw, cents)
    val trained = recallOf(
      Similarity.ivfTopKTrained(vT, cents, nQueries, topK = 3).collect(), truth)
    vT.unpersist()

    info(f"IVF recall@3, nprobe=2: trained $trained%.3f vs untrained $untrained%.3f")
    assert(trained > untrained,
      s"trained recall $trained must beat untrained $untrained at nprobe=2")
    assert(trained >= 0.9, s"trained recall $trained")
  }

  /** Auto-scaled plane count: at 10× the corpus the index must not scan
    * 10× the candidates — autoNumPlanes deepens the bucket space so
    * candidates-per-query stays ~(numPlanes+1)·targetBucket while
    * planted-twin recall holds.
    */
  test("auto-scaled planes bound candidates-per-query at 1x and 10x corpus") {
    import spark.implicits._
    val dims = 64
    val nQueries = 60

    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }

    for (noiseRows <- Seq(400, 4600)) {
      val rnd = new Random(11)
      val bases = (0 until nQueries).map(_ => Array.fill(dims)(rnd.nextGaussian()))
      val rows =
        bases.zipWithIndex.map { case (b, i) => (i.toLong, unit(b)) } ++
          bases.zipWithIndex.map { case (b, i) =>
            (1000L + i, unit(b.map(_ + 0.03 * rnd.nextGaussian())))
          } ++
          (0 until noiseRows).map(i =>
            (2000L + i, unit(Array.fill(dims)(rnd.nextGaussian()))))
      val n = rows.size

      val (v, numPlanes) = Similarity.prepareAuto(spark, rows.toDF("vec_id", "embedding"))
      assert(numPlanes === Similarity.autoNumPlanes(n))

      val found = Similarity.annTopK(v, nQueries, topK = 1, numPlanes = numPlanes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val recall = (0 until nQueries)
        .count(q => found.get(q.toLong).contains(1000L + q)).toDouble / nQueries
      assert(recall >= 0.9, s"n=$n planes=$numPlanes recall=$recall")

      // candidate volume: join size before ranking, per query
      val q = v.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"),
          explode(Similarity.probesCol(col("bucket"), numPlanes)).as("probe"))
      val candPerQuery = v.join(q,
        col("bucket") === col("probe") && col("vec_id") =!= col("qid"))
        .count().toDouble / nQueries
      val expected = (numPlanes + 1).toDouble * n / (1L << numPlanes)
      assert(candPerQuery <= 3 * expected + 64,
        s"n=$n planes=$numPlanes candidates/query $candPerQuery vs expected ~$expected")
      v.unpersist()
    }
  }

  test("PQ codes reconstruct a direction positively correlated with the source") {
    import spark.implicits._
    // em5 emits exploded (vec_id, subspace, code) rows (driver-comparable
    // shape); re-group to per-vector code arrays for reconstruction.
    val rows = graft.SparkEntry.queries("em5_pq_codes")(spark, graft.TestSpark.Sf0001)
      .groupBy("vec_id")
      .agg(sort_array(collect_list(struct(col("subspace"), col("code")))).as("sc"))
      .select(col("vec_id"), expr("transform(sc, x -> x.code)").as("codes"))
      .join(
        graft.Tables(spark, graft.TestSpark.Sf0001, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")),
        Seq("vec_id"))
      .select(col("codes"), col("emb"))
      .as[(Seq[Int], Seq[Double])].collect()
    assert(rows.nonEmpty)
    val cosines = rows.map { case (codes, emb) =>
      val recon = codes.zipWithIndex.flatMap { case (code, s) =>
        Similarity.pqCentroid(s)(code - 1).map(_.toDouble) // codes are 1-based
      }
      val dot = recon.zip(emb).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(recon.map(x => x * x).sum) * math.sqrt(emb.map(x => x * x).sum))
    }
    // every subspace picks its max-dot centroid among 16 draws, so the
    // reconstruction should rarely anti-correlate and must correlate
    // positively on average (the JL/PQ direction-preservation property)
    assert(cosines.sum / cosines.length > 0.1,
      s"mean reconstruction cosine ${cosines.sum / cosines.length}")
    assert(cosines.count(_ < 0) <= cosines.length / 20, "too many anti-correlated rows")
  }

  test("k-means-trained PQ codebooks beat the ±1 oracle codebooks on reconstruction") {
    import spark.implicits._
    val raw = graft.Tables(spark, graft.TestSpark.Sf0001, "embeddings")
    val withEmb = raw.select(
      col("vec_id"), col("embedding").cast("array<double>").as("emb"))

    def encodeAndCollect(books: Array[Array[Array[Double]]]): Array[(Seq[Int], Seq[Double])] =
      Similarity.pqEncodeTrained(spark, raw, books)
        .join(withEmb, Seq("vec_id"))
        .select(col("codes"), col("emb"))
        .as[(Seq[Int], Seq[Double])].collect()

    // (mean reconstruction cosine, mean squared reconstruction error)
    def quality(rows: Array[(Seq[Int], Seq[Double])],
        books: Array[Array[Array[Double]]]): (Double, Double) = {
      val per = rows.map { case (codes, emb) =>
        val recon = codes.zipWithIndex.flatMap { case (code, s) =>
          books(s)(code - 1) // codes are 1-based
        }
        val dot = recon.zip(emb).map { case (a, b) => a * b }.sum
        val cos = dot / (math.sqrt(recon.map(x => x * x).sum) *
          math.sqrt(emb.map(x => x * x).sum))
        val mse = recon.zip(emb).map { case (a, b) => (a - b) * (a - b) }.sum / emb.length
        (cos, mse)
      }
      (per.map(_._1).sum / per.length, per.map(_._2).sum / per.length)
    }

    val pm1Books = Array.tabulate(8, 16)((s, c) =>
      Similarity.pqCentroid(s)(c).map(_.toDouble))
    val trainedBooks = Similarity.trainPqCodebooks(raw)
    val (pm1Cos, pm1Mse) = quality(encodeAndCollect(pm1Books), pm1Books)
    val (trCos, trMse) = quality(encodeAndCollect(trainedBooks), trainedBooks)
    // trained cells minimize actual per-subspace quantization error;
    // the ±1 family only ever captures direction
    assert(trMse < pm1Mse, s"trained mse $trMse vs ±1 mse $pm1Mse")
    assert(trCos > pm1Cos, s"trained cos $trCos vs ±1 cos $pm1Cos")
  }
}
