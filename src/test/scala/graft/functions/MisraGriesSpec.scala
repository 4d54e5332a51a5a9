package graft.functions

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Misra–Gries sketch guarantees: candidate superset of true heavy
  * hitters, bounded undercount, capacity bound — all under partitioned
  * (merge-exercising) execution — plus hh1's sketch+verify == exact.
  */
class MisraGriesSpec extends SparkSpec {

  private def sketch(items: Seq[Long], m: Int, parts: Int): Map[Long, Long] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rows = items.toDF("v").repartition(parts)
      .agg(call_function(GraftFunctions.MisraGriesName, col("v"), lit(m)))
      .head().getSeq[org.apache.spark.sql.Row](0)
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // adversarial stream: one 30% item, one 10% item, long distinct tail
  private val n = 1000
  private val stream: Seq[Long] =
    Seq.fill(300)(7L) ++ Seq.fill(100)(13L) ++ (1000L until 1600L)

  test("every item above N/(m+1) survives, with bounded undercount") {
    require(stream.size == n)
    for (parts <- Seq(1, 4, 7); m <- Seq(8, 32)) {
      val sk = sketch(stream, m, parts)
      assert(sk.size <= m, s"capacity exceeded: ${sk.size} > $m (parts=$parts)")
      val bound = n / (m + 1)
      for ((item, truth) <- Seq(7L -> 300L, 13L -> 100L) if truth > bound) {
        val est = sk.getOrElse(item,
          fail(s"heavy item $item missing (m=$m parts=$parts): $sk"))
        assert(est <= truth, s"overcount for $item: $est > $truth")
        assert(est >= truth - bound,
          s"undercount beyond N/(m+1) for $item: $est < $truth - $bound")
      }
    }
  }

  test("tail items never report more than their true count plus nothing") {
    val sk = sketch(stream, 8, 4)
    // every estimate is a lower bound on some true count; a tail item
    // (true count 1) can appear, but only with est <= 1
    sk.foreach { case (item, est) =>
      val truth = stream.count(_ == item).toLong
      assert(est <= truth, s"estimate $est exceeds truth $truth for $item")
    }
  }

  test("guarantees hold for pinned-seed random streams at every m") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.{Seed => GenSeed}
    for (seed <- 0 until 4) {
      val items = Gen.listOfN(400, Gen.frequency(
        5 -> Gen.choose(0L, 5L), // few hot items
        1 -> Gen.choose(100L, 1000L))) // long tail
        .pureApply(Gen.Parameters.default, GenSeed(seed.toLong))
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      for (m <- Seq(4, 10, 24)) {
        val sk = sketch(items, m, parts = 2 + seed)
        assert(sk.size <= m)
        val bound = items.size / (m + 1)
        truth.foreach { case (item, t) =>
          if (t > bound)
            assert(sk.contains(item), s"seed=$seed m=$m: missing $item (count $t > $bound)")
          sk.get(item).foreach { est =>
            assert(est <= t && est >= t - bound, s"seed=$seed m=$m item=$item est=$est truth=$t")
          }
        }
      }
    }
  }

  test("hh1 sketch+verify equals the exact heavy-hitters computation") {
    val viaSketch = graft.SparkEntry.queries("hh1_heavy_hitters")(spark, TestSpark.Sf0001)
    val toks = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks
      .crossJoin(toks.agg(count(lit(1)).as("n_tokens")))
      .groupBy("tok", "n_tokens").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 50 >= col("n_tokens"))
      .select(col("tok"), col("cnt"),
        expr("cnt * 10000 DIV n_tokens").as("share_bps"))
    assert(rowSet(viaSketch) === rowSet(exact))
  }
}
