package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge semantics of the generic as-of join: tie inclusivity, direction,
  * left vs inner, multi-row payload correctness against a brute-force
  * per-row reduction.
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe(rows: (Long, Long, Long)*) =
    rows.toDF("id", "k", "t")
  private def build(rows: (Long, Long, String)*) =
    rows.toDF("k", "t", "v").select(col("k"), col("t"), col("v"))

  test("backward picks the latest at-or-before, per key") {
    val p = probe((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 250L))
    val b = build((10L, 50L, "a"), (10L, 200L, "b"), (20L, 240L, "c"))
    val got = AsofJoin
      .asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("a build row exactly at the probe time matches (inclusive tie)") {
    val p = probe((1L, 10L, 100L))
    val b = build((10L, 100L, "exact"), (10L, 99L, "earlier"))
    val got = AsofJoin
      .asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
      .select("v").as[String].collect()
    assert(got.toSeq === Seq("exact"))
  }

  test("inner drops unmatched probes; left keeps them with null payload") {
    val p = probe((1L, 10L, 100L), (2L, 10L, 10L)) // id=2 precedes all builds
    val b = build((10L, 50L, "a"))
    val inner = AsofJoin
      .asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
    assert(inner.select("id").as[Long].collect().toSeq === Seq(1L))
    val leftJ = AsofJoin
      .asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"), left = true)
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(leftJ === Map(1L -> Some("a"), 2L -> None))
  }

  test("forward picks the earliest at-or-after, inclusive at equal time") {
    val p = probe((1L, 10L, 100L), (2L, 10L, 201L))
    val b = build((10L, 100L, "now"), (10L, 200L, "later"), (10L, 300L, "latest"))
    val got = AsofJoin
      .asofForward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "now", 2L -> "latest"))
  }

  test("matches brute-force reduction on a random corpus") {
    val rnd = new scala.util.Random(7)
    val pRows = Seq.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    // dedup (k, t) so the as-of pick is uniquely determined
    val bRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, s"v$i"))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val p = probe(pRows: _*)
    val b = build(bRows: _*)
    val expected = (for {
      (id, k, t) <- pRows
      cands = bRows.filter(br => br._1 == k && br._2 <= t)
      if cands.nonEmpty
    } yield id -> cands.maxBy(_._2)._3).toMap
    val got = AsofJoin
      .asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
      .select("id", "v").as[(Long, String)].collect().toMap
    assert(got === expected)
  }

  test("duplicate build (key, time) rows: the greatest payload wins, rerun-stable") {
    val p = probe((1L, 10L, 150L))
    // three build rows at the SAME (key, time) in hostile input orders;
    // without the payload tiebreak, last() returns partition-order luck
    val orders = Seq(
      Seq("alpha", "mid", "zz"), Seq("zz", "alpha", "mid"), Seq("mid", "zz", "alpha"))
    val results = orders.map { vs =>
      val b = build(vs.map(v => (10L, 100L, v)): _*).repartition(3)
      AsofJoin.asofBackward(p, b, Seq("k"), "t", "t", Seq("v" -> "v"))
        .select("v").as[String].collect().toSeq
    }
    assert(results.forall(_ === Seq("zz")), s"tie pick not deterministic: $results")
  }
}
