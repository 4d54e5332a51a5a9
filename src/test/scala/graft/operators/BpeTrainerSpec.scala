package graft.operators

import graft.SparkSpec

/** The distributed BPE trainer against an INDEPENDENT single-node
  * reference implementation (the dictionary-based algorithm from the
  * published description: count pairs over the word-frequency dict,
  * merge the argmax everywhere, repeat) — plus merge-application
  * semantics and the encode path.
  */
class BpeTrainerSpec extends SparkSpec {

  import BpeTrainer.{EndOfWord, Merge, applyMerge, encode, train}

  /** Reference trainer: plain Scala maps, no Spark. Same tie-break
    * (freq desc, then (left, right) lexicographic).
    */
  private def referenceTrain(corpus: Seq[String], k: Int): Seq[Merge] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toVector :+ EndOfWord) -> ws.size.toLong
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= k) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) return merges.toSeq
      val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      merges += Merge(rank, l, r, f)
      vocab = vocab.toSeq.map { case (syms, fr) =>
        applyMerge(syms, l, r).toVector -> fr
      }.groupBy(_._1).map { case (s, m) => s -> m.map(_._2).sum }
      rank += 1
    }
    merges.toSeq
  }

  test("applyMerge: left-to-right non-overlapping (reference semantics)") {
    assert(applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(applyMerge(Seq("a", "a", "a", "a", "a"), "a", "a") ===
      Seq("aa", "aa", "a"))
    assert(applyMerge(Seq("x", "a", "b", "y", "a", "b"), "a", "b") ===
      Seq("x", "ab", "y", "ab"))
    assert(applyMerge(Seq("q"), "a", "b") === Seq("q"))
  }

  test("distributed trainer matches the single-node reference exactly") {
    import spark.implicits._
    val corpus = Seq(
      "low low low low low",
      "lower lower newest newest newest newest newest newest",
      "widest widest widest",
      "low lower newest")
    val df = corpus.toDF("text")
    val got = train(df, "text", numMerges = 12)
    val want = referenceTrain(corpus, 12)
    assert(got === want)
    // the textbook corpus learns (e,s) then (es,t) then (est,</w>) early
    assert(got.take(3).map(m => (m.left, m.right)) ===
      want.take(3).map(m => (m.left, m.right)))
  }

  test("trainer on real corpus slice is deterministic across runs") {
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val a = train(docs, "text", numMerges = 6)
    val b = train(docs, "text", numMerges = 6)
    assert(a === b)
    assert(a.size === 6)
    assert(a.forall(_.freq > 0))
    // the argmax pair count never increases round-over-round: a merged
    // pair's successors each occur at most as often as it did
    assert(a.map(_.freq) === a.map(_.freq).sorted(Ordering[Long].reverse))
  }

  test("encode applies merges in rank order; round-trips word boundaries") {
    val merges = Seq(Merge(1, "a", "b", 10), Merge(2, "ab", "c", 5))
    assert(encode("abc ab c", merges) ===
      Seq("abc", EndOfWord, "ab", EndOfWord, "c", EndOfWord))
    // detokenization: concatenating symbols and splitting on </w>
    // restores the original words
    val toks = encode("hello world", Seq.empty)
    val restored = toks.mkString("").split(EndOfWord).toSeq
    assert(restored === Seq("hello", "world"))
  }
}
