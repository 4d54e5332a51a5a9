package graft.operators

import graft.{SparkEntry, SparkSpec, TestSpark}

/** Naive Bayes classifier (nb1): checked against an independent plain-
  * Scala NB implementation on a hand-built corpus, plus shape/sanity on
  * the driver testdata.
  */
class ClassificationSpec extends SparkSpec {

  import spark.implicits._

  /** Independent single-node NB with the same fixed-point convention:
    * per-token log-probs rounded to 1e-6 longs, summed exactly.
    */
  private def referenceNb(
      train: Seq[(String, Seq[String])],
      test: Seq[(Long, Seq[String])]): Map[Long, (String, Long)] = {
    def lp6(x: Double): Long = math.round(math.log(x) * 1000000.0)
    val labels = train.map(_._1).distinct.sorted
    val vocab = train.flatMap(_._2).filter(_.nonEmpty).distinct.size
    val totalDocs = train.size
    val byLabel = train.groupBy(_._1)
    val stats = labels.map { l =>
      val toks = byLabel(l).flatMap(_._2).filter(_.nonEmpty)
      val denom = toks.size + vocab
      val counts = toks.groupBy(identity).map { case (t, g) => t -> g.size }
      l -> ((lp6(byLabel(l).size.toDouble / totalDocs),
        lp6(1.0 / denom), denom, counts))
    }.toMap
    test.map { case (id, toks0) =>
      val toks = toks0.filter(_.nonEmpty)
      val scored = labels.map { l =>
        val (prior6, def6, denom, counts) = stats(l)
        val s = prior6 + toks.map { t =>
          counts.get(t).map(c => lp6((c + 1.0) / denom)).getOrElse(def6)
        }.sum
        (l, s)
      }
      val (bl, bs) = scored.minBy { case (l, s) => (-s, l) }
      id -> ((bl, bs))
    }.toMap
  }

  test("nb1 matches an independent NB implementation on a hand corpus") {
    val train = Seq(
      ("sport", Seq("ball", "goal", "goal", "team")),
      ("sport", Seq("team", "win", "ball")),
      ("tech", Seq("code", "spark", "spark", "scala")),
      ("tech", Seq("scala", "code", "bug")),
      ("tech", Seq("spark", "bug")))
    val test = Seq(
      (1L, Seq("spark", "scala", "goal")), // tech-ish
      (3L, Seq("ball", "team", "goal")), // sport-ish
      (5L, Seq("quantum", "quantum")), // all-unknown tokens
      (7L, Seq.empty[String])) // empty doc: dropped (no tokens)
    val expected = referenceNb(train, test.filter(_._2.nonEmpty))

    val trainDf = train.toDF("label", "toks")
    val testDf = test.toDF("doc_id", "toks")
    val (classes, model) = Classification.fit(trainDf, "label", "toks")
    val got = Classification.predict(testDf, classes, model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap

    assert(got.keySet === expected.keySet)
    expected.foreach { case (id, (l, s)) =>
      assert(got(id) === ((l, s)), s"doc $id")
    }
    assert(got(1L)._1 === "tech")
    assert(got(3L)._1 === "sport")
    // all-unknown doc: decided purely by prior + |d|·default
    assert(got(5L)._1 === "tech") // tech has the larger prior (3/5)
  }

  test("nb1 on driver testdata: one row per odd non-empty doc, valid labels") {
    val df = SparkEntry.queries("nb1_naive_bayes")(spark, TestSpark.Sf0001)
    val rows = df.collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) % 2 == 1))
    assert(rows.forall(r => langs.contains(r.getString(1))))
    assert(rows.forall(r => langs.contains(r.getString(3))))
    assert(rows.forall(r => r.getLong(2) < 0L)) // log-prob scores
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // correct == (pred == actual) consistency
    assert(rows.forall(r => r.getBoolean(4) === (r.getString(1) == r.getString(3))))
  }

  // partition invariance is covered by PartitionInvarianceSpec, which
  // runs nb1 under 1/5/32 shuffle partitions alongside the other
  // determinism-sensitive queries
}
