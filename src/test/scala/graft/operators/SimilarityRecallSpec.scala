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
}
