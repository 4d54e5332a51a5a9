package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Inverted index + positional phrase search: postings shape on hand
  * data, overlapping-match semantics, and ix2 checked against an
  * independent sliding-window scan of the same corpus.
  */
class InvertedIndexSpec extends SparkSpec {

  import spark.implicits._

  private val hand = Seq(
    (1L, "a b a"),
    (2L, "b b b"),
    (3L, "c a b a b"),
    (4L, "")).toDF("doc_id", "text")

  test("postings carry 1-based sorted in-doc positions; empty docs drop") {
    val p = InvertedIndex.postings(hand).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Int](2)).toMap
    assert(p((("a"), 1L)) === Seq(1, 3))
    assert(p((("b"), 2L)) === Seq(1, 2, 3))
    assert(p((("a"), 3L)) === Seq(2, 4))
    assert(p((("c"), 3L)) === Seq(1))
    assert(!p.keySet.exists(_._2 == 4L), "empty doc must not appear")
    assert(!p.keySet.exists(_._1 == ""), "empty token must not appear")
  }

  test("phrase search counts overlapping matches with 1-based first_pos") {
    val m = InvertedIndex.phraseSearch(hand, Seq("b", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // "b b b" contains "b b" at positions 1 and 2 (overlapping)
    assert(m === Map(2L -> ((2L, 1))))

    val tri = InvertedIndex.phraseSearch(hand, Seq("a", "b", "a")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(tri === Map(1L -> ((1L, 1)), 3L -> ((1L, 2))))

    val ab = InvertedIndex.phraseSearch(hand, Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(ab === Map(1L -> ((1L, 1)), 3L -> ((2L, 2))))
  }

  test("ix2 on driver testdata matches an independent sliding-window scan") {
    val docs = graft.Tables(spark, TestSpark.Sf0001, "documents")
    val expected = docs.select("doc_id", "text").collect().flatMap { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      val starts = toks.sliding(2).zipWithIndex.collect {
        case (Array("batch", "stream"), i) => i + 1
      }.toSeq
      if (starts.isEmpty) None
      else Some(r.getLong(0) -> ((starts.size.toLong, starts.min)))
    }.toMap
    val got = graft.SparkEntry.queries("ix2_phrase_search")(spark, TestSpark.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("ix3 BM25 matches an independent single-node scorer") {
    val docs = graft.Tables(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val terms = Seq("spark", "join", "window")
    val (k1, b) = (1.2, 0.75)
    val nonEmpty = docs.filter(_._2.nonEmpty)
    val nDocs = nonEmpty.size.toLong
    val nToks = nonEmpty.map(_._2.size.toLong).sum
    val dfT = terms.map(t =>
      t -> nonEmpty.count(_._2.contains(t)).toLong).toMap
    val expected = nonEmpty.flatMap { case (id, toks) =>
      val hits = terms.filter(toks.contains)
      if (hits.isEmpty) None
      else {
        val score6 = hits.map { t =>
          val tf = toks.count(_ == t).toDouble
          val idf = math.log((nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1.0)
          val norm = tf / (tf + k1 * (1.0 - b +
            b * (toks.size.toLong * nDocs).toDouble / nToks))
          math.round(idf * norm * 1000000.0)
        }.sum
        Some((id, hits.size.toLong, score6))
      }
    }.sortBy { case (id, _, s) => (-s, id) }.take(20)

    val got = graft.SparkEntry.queries("ix3_bm25_search")(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.size === 20)
  }

  test("ix1 digest is consistent with materialized postings") {
    val digest = graft.SparkEntry.queries("ix1_inverted_index")(spark, TestSpark.Sf0001)
    val fromPostings = InvertedIndex.postings(
        graft.Tables(spark, TestSpark.Sf0001, "documents"))
      .select(col("term"), col("doc_id"), col("positions"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(size(col("positions"))).as("cf"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
    val d = digest.select("term", "df", "cf", "min_doc", "max_doc")
    assert(rowSet(d) === rowSet(fromPostings))
  }
}
