package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted-index construction and positional phrase search — the
  * retrieval-side primitives of a corpus pipeline (term lookup,
  * contamination probes by phrase, boolean search over a crawl).
  *
  * Scale design (100 TB):
  *   - The index is BUILT as a distributed table partitioned by term —
  *     one explode + one map-side-combined aggregation; postings never
  *     pass through the driver. At warehouse scale you'd write
  *     [[postings]] bucketed by term so lookups are single-partition
  *     probes; the registry row emits the per-term DIGEST (df/cf/
  *     min/max/checksums) because collecting full posting arrays is
  *     exactly what a 100 TB index must never do.
  *   - Phrase search joins the OCCURRENCE table against itself once per
  *     phrase term, but only AFTER filtering to the phrase's terms —
  *     the scan prunes to |phrase| postings lists (pushed IN-filter),
  *     so join input is the postings of the rarest terms, not the
  *     corpus. Position arithmetic (`pos + i`) turns adjacency into an
  *     equi-join key: (doc, pos) — co-partitioned, no range or
  *     nested-loop join anywhere.
  *
  * Reference anchor: generalizes the reference's per-recipe ingredient
  * search (src/query_data.py Q1's GROUP BY over exploded ingredients)
  * from frequency counting to position-aware retrieval.
  */
object InvertedIndex {

  /** (doc_id, pos, tok) occurrence rows, pos 1-based, empties dropped. */
  def occurrences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
        col("col").as("tok"))
      .filter(col("tok") =!= "")

  /** The positional index: one row per (term, doc) with the sorted
    * in-doc position list — the shape you bucket by term and write.
    */
  def postings(docs: DataFrame): DataFrame =
    occurrences(docs)
      .groupBy(col("tok").as("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Docs containing `terms` as an exact adjacent phrase: one self-join
    * per extra term on the (doc, pos+i) equi-key, occurrence table
    * pre-filtered to the phrase's terms.
    */
  def phraseSearch(docs: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phrase must have at least one term")
    val occ = occurrences(docs).filter(col("tok").isin(terms: _*))
    val first = occ.filter(col("tok") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matches = terms.zipWithIndex.tail.foldLeft(first) {
      case (acc, (t, i)) =>
        val nxt = occ.filter(col("tok") === t)
          .select(col("doc_id").as("d"), (col("pos") - i).as("p"))
        acc.join(nxt, acc("doc_id") === col("d") && acc("pos") === col("p"))
          .select(acc("doc_id"), acc("pos"))
    }
    matches.groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min("pos").as("first_pos"))
  }

  private val OracleOcc =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |occ AS (SELECT doc_id, pos, tok FROM (
      |  SELECT doc_id, CAST(unnest(range(1, len(l)+1)) AS INT) AS pos,
      |         unnest(l) AS tok FROM t)
      |  WHERE tok <> '')
      |""".stripMargin

  val all: Seq[Q] = Seq(
    // IX1: per-term index digest — df/cf/bounds plus two posting
    // checksums, the verifiable summary of the distributed index
    // (the full postings are a build artifact, not a result set).
    // Two-stage aggregation: pre-grouping by (term, doc) makes every
    // doc-level stat a plain agg over unique rows, so the plan has NO
    // Expand stream (countDistinct mixed with plain aggs would) and
    // both stages combine map-side.
    Q(
      "ix1_inverted_index",
      (s, dir) =>
        occurrences(Tables(s, dir, "documents"))
          .groupBy(col("tok").as("term"), col("doc_id"))
          .agg(count(lit(1)).as("tf"), sum(col("pos")).as("ps"))
          .groupBy(col("term"))
          .agg(
            count(lit(1)).as("df"),
            sum(col("tf")).as("cf"),
            min(col("doc_id")).as("min_doc"),
            max(col("doc_id")).as("max_doc"),
            sum(col("doc_id")).as("doc_sum"),
            sum(col("ps")).as("pos_sum"))
          .orderBy("term"),
      Some(OracleOcc +
        """SELECT tok AS term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
          |  CAST(count(*) AS BIGINT) AS cf,
          |  CAST(min(doc_id) AS BIGINT) AS min_doc,
          |  CAST(max(doc_id) AS BIGINT) AS max_doc,
          |  CAST(sum(doc_id) AS BIGINT) AS doc_sum,
          |  CAST(sum(pos) AS BIGINT) AS pos_sum
          |FROM occ GROUP BY tok ORDER BY tok""".stripMargin)
    ),
    // IX2: positional phrase search for "batch stream" — adjacency as
    // an equi-join over the pruned occurrence table.
    Q(
      "ix2_phrase_search",
      (s, dir) =>
        phraseSearch(Tables(s, dir, "documents"), Seq("batch", "stream"))
          .orderBy("doc_id"),
      Some(OracleOcc +
        """SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_matches,
          |  MIN(a.pos) AS first_pos
          |FROM occ a JOIN occ b
          |  ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.tok = 'stream'
          |WHERE a.tok = 'batch'
          |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin)
    )
  )
}
