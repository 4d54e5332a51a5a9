package graft.operators

import graft.SparkSpec

/** kmeansAssign's arithmetic contract on hand-checkable geometry:
  * separated groups converge to the obvious clustering, ties break to
  * the smallest cluster id, rounds=0 assigns under the seed centroids,
  * and results are identical across repartitionings (the integer-unit
  * determinism the oracle relies on).
  */
class KmeansAssignSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toSeq.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")

  test("two separated groups cluster by group after two rounds") {
    // seeds are ids 1 and 2 — one in each group by construction
    val df = vecs(
      1L -> Seq(0.1, 0.1), 2L -> Seq(0.4, 0.4),
      3L -> Seq(0.12, 0.08), 4L -> Seq(0.42, 0.38),
      5L -> Seq(0.09, 0.11), 6L -> Seq(0.38, 0.41))
    val out = Similarity.kmeansAssign(spark, df, k = 2, rounds = 2)
      .as[(Long, Int)].collect().toMap
    assert(Seq(1L, 3L, 5L).forall(out(_) == 1))
    assert(Seq(2L, 4L, 6L).forall(out(_) == 2))
  }

  test("equidistant point breaks ties to the smallest cluster id") {
    // rounds = 0: assignment under the seed centroids themselves
    val df = vecs(
      1L -> Seq(0.0, 0.0), 2L -> Seq(0.2, 0.0), 3L -> Seq(0.1, 0.0))
    val out = Similarity.kmeansAssign(spark, df, k = 2, rounds = 0)
      .as[(Long, Int)].collect().toMap
    assert(out(1L) === 1 && out(2L) === 2)
    assert(out(3L) === 1, "equidistant point must take the smaller id")
  }

  test("assignment is invariant under input repartitioning") {
    val pts = (1L to 40L).map(i =>
      i -> Seq((i % 7) * 0.05 + (if (i % 2 == 0) 0.3 else 0.0), i * 0.003))
    val a = Similarity.kmeansAssign(spark, vecs(pts: _*), k = 3, rounds = 2)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    val b = Similarity.kmeansAssign(spark, vecs(pts: _*).repartition(7), k = 3, rounds = 2)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a === b)
  }
}
