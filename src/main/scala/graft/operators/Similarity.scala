package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64 dims).
  *
  * Two paths:
  *   - ss1: brute-force cosine top-k for a bounded query set — the exactness
  *     baseline. The candidate side streams once per query batch; fine when
  *     |queries| is small, never for all-pairs.
  *   - ss2/em1: random-hyperplane LSH (SimHash for vectors) — each vector gets
  *     an 8-bit bucket from the signs of 8 fixed ±1 hyperplane projections;
  *     search/dedup joins on the bucket, turning O(n²) into a key join that
  *     scales with bucket occupancy. At 100 TB you'd raise the plane count to
  *     keep buckets bounded and add multi-probe; the operator shape (per-row
  *     signature → bucket equi-join → verify) is unchanged.
  *
  * Hyperplane coefficients are md5-derived constants computed at plan time
  * and inlined into both the Spark plan and the DuckDB oracle, so both
  * engines use bit-identical planes and nothing is recomputed per row.
  *
  * Float determinism: components are cast to double before any arithmetic;
  * scores are rounded to 6 dp before ranking so the ranking can't flip on
  * sub-ulp accumulation differences between engines.
  */
object Similarity {

  private val NumPlanes = 8
  private val Dims = 64
  private val NumQueries = 8 // vec_id < 8 are the demo query vectors
  private val TopK = 3

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** planes(p)(d) ∈ {-1, 1}, derived from md5(p ++ "_" ++ d). */
  private val planes: Array[Array[Int]] =
    Array.tabulate(NumPlanes, Dims) { (p, d) =>
      if ((Integer.parseInt(md5hex(s"${p}_$d").substring(0, 4), 16) & 1) == 1) 1 else -1
    }

  /** embedding as array<double> (cast once, per row). */
  private val embD: Column = col("embedding").cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** 8-bit LSH bucket from hyperplane projection signs. */
  private val bucketCol: Column =
    (0 until NumPlanes).map { p =>
      val proj = dot(embD, typedlit(planes(p).map(_.toDouble).toSeq))
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def vectors(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(
        col("vec_id"),
        embD.as("emb"),
        sqrt(dot(embD, embD)).as("nrm"))

  private def withBucket(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), embD.as("emb"), sqrt(dot(embD, embD)).as("nrm"),
        bucketCol.as("bucket"))

  private def cosine(qe: Column, qn: Column, ce: Column, cn: Column): Column =
    round(dot(qe, ce) / (qn * cn), 6)

  // ---- DuckDB oracle fragments ----

  /** DuckDB: same hyperplane bucket, coefficients inlined as an int list. */
  private val bucketSql: String =
    (0 until NumPlanes).map { p =>
      val coefs = planes(p).mkString("[", ",", "]")
      s"""(CASE WHEN list_sum(list_transform(generate_series(1,$Dims),
         |   i -> CAST(embedding[i] AS DOUBLE) * ($coefs)[i])) > 0
         | THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  private val vecSql =
    s"""v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
       |        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       |      FROM embeddings)""".stripMargin

  private val vecBucketSql =
    s"""v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
       |        sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm,
       |        $bucketSql AS bucket
       |      FROM embeddings)""".stripMargin

  private val cosSql =
    s"round(list_sum(list_transform(generate_series(1,$Dims), i -> q.emb[i]*c.emb[i])) / (q.nrm*c.nrm), 6)"

  val all: Seq[Q] = Seq(
    // Brute-force cosine top-k (exact baseline, bounded query set).
    Q(
      "ss1_cosine_topk",
      (s, dir) => {
        val v = vectors(s, dir)
        val q = v.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
        val pairs = v.join(broadcast(q), col("vec_id") =!= col("qid"))
          .select(
            col("qid"),
            col("vec_id").as("neighbor_id"),
            cosine(col("qemb"), col("qnrm"), col("emb"), col("nrm")).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(desc("score"), asc("neighbor_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK)
          .select("qid", "neighbor_id", "score")
          .orderBy("qid", "neighbor_id")
      },
      Some(s"""WITH $vecSql,
              |p AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id, $cosSql AS score
              |      FROM v q JOIN v c ON c.vec_id <> q.vec_id
              |      WHERE q.vec_id < $NumQueries)
              |SELECT qid, neighbor_id, score FROM
              |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rn FROM p)
              |WHERE rn <= $TopK ORDER BY qid, neighbor_id""".stripMargin)
    ),

    // LSH-bucketed ANN top-k: candidates restricted to the query's bucket.
    Q(
      "ss2_ann_lsh_topk",
      (s, dir) => {
        val v = withBucket(s, dir)
        val q = v.filter(col("vec_id") < NumQueries)
          .select(col("vec_id").as("qid"), col("emb").as("qemb"),
            col("nrm").as("qnrm"), col("bucket").as("qbucket"))
        val pairs = v.join(broadcast(q),
            col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
          .select(
            col("qid"),
            col("vec_id").as("neighbor_id"),
            cosine(col("qemb"), col("qnrm"), col("emb"), col("nrm")).as("score"))
        val w = Window.partitionBy(col("qid")).orderBy(desc("score"), asc("neighbor_id"))
        pairs.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= TopK)
          .select("qid", "neighbor_id", "score")
          .orderBy("qid", "neighbor_id")
      },
      Some(s"""WITH $vecBucketSql,
              |p AS (SELECT q.vec_id AS qid, c.vec_id AS neighbor_id, $cosSql AS score
              |      FROM v q JOIN v c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
              |      WHERE q.vec_id < $NumQueries)
              |SELECT qid, neighbor_id, score FROM
              |  (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, neighbor_id) AS rn FROM p)
              |WHERE rn <= $TopK ORDER BY qid, neighbor_id""".stripMargin)
    ),

    // Embedding near-dup detection: same-bucket pairs above a cosine floor.
    Q(
      "em1_embedding_neardup",
      (s, dir) => {
        val v = withBucket(s, dir)
        v.as("a")
          .join(v.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(
            col("a.vec_id").as("vec_a"),
            col("b.vec_id").as("vec_b"),
            cosine(col("a.emb"), col("a.nrm"), col("b.emb"), col("b.nrm")).as("score"))
          .filter(col("score") >= 0.4)
          .orderBy("vec_a", "vec_b")
      },
      Some(s"""WITH $vecBucketSql
              |SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, $cosSql AS score
              |FROM v q JOIN v c ON c.bucket = q.bucket AND q.vec_id < c.vec_id
              |WHERE $cosSql >= 0.4 ORDER BY vec_a, vec_b""".stripMargin)
    )
  )
}
