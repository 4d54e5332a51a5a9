package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a cleaned document corpus into
  * fixed-length training sequences (the GPT-style "concatenate documents
  * and chunk every `Budget` tokens" layout). The output is the packing
  * TABLE a trainer consumes: one row per (sequence, document-span), with
  * the span's offset inside the document and inside the sequence, so a
  * loader can assemble any sequence by slicing the referenced documents
  * — no text is moved here at all.
  *
  * Scale shape: packing is computed WITHIN shards (`source` here; at
  * 100 TB, fixed doc_id ranges so shard volume is uniform) — one shuffle
  * to co-locate a shard, then a window prefix-sum per shard. There is
  * deliberately NO global cumulative sum: a corpus-wide running offset
  * would serialize on a single ordered partition chain, while per-shard
  * packing is embarrassingly parallel and costs at most one partial
  * trailing sequence per shard — the trade every production pipeline
  * takes. Every quantity is integer token arithmetic (whitespace tokens,
  * tx1's convention), so the DuckDB oracle reproduces the table
  * bit-for-bit; the window SUM is cast back to BIGINT on the oracle side
  * (DuckDB widens to HUGEINT).
  *
  * Reference anchor: the reference ends at clean warehouse tables; this
  * is the step a training-data user runs next on the same corpus.
  */
object Packing {

  /** Tokens per packed training sequence. */
  private val Budget = 512L

  val all: Seq[Q] = Seq(
    // PK1: the packing table. A document starting at shard offset
    // `start_off` with n tokens spans sequences start_off/B through
    // (start_off+n-1)/B; each (doc, seq) span carries its slice offsets.
    Q(
      "pk1_sequence_pack",
      (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("source"), col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        toks
          .withColumn("start_off", coalesce(sum("n_tokens").over(w), lit(0L)))
          .withColumn("seq_id",
            explode(sequence(
              expr(s"start_off DIV $Budget"),
              expr(s"(start_off + n_tokens - 1) DIV $Budget"))))
          .select(
            col("source"),
            col("seq_id"),
            col("doc_id"),
            greatest(col("seq_id") * Budget - col("start_off"), lit(0L))
              .as("doc_start"),
            (least((col("seq_id") + 1) * Budget, col("start_off") + col("n_tokens")) -
              greatest(col("seq_id") * Budget, col("start_off"))).as("span_len"),
            (greatest(col("start_off"), col("seq_id") * Budget) -
              col("seq_id") * Budget).as("seq_start"))
          .orderBy("source", "seq_id", "doc_id")
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              |          FROM documents),
              |o AS (SELECT source, doc_id, n_tokens,
              |        CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
              |      FROM t),
              |sp AS (SELECT source, doc_id, n_tokens, start_off,
              |         unnest(generate_series(start_off // $Budget,
              |                                (start_off + n_tokens - 1) // $Budget)) AS seq_id
              |       FROM o)
              |SELECT source, seq_id, doc_id,
              |  greatest(seq_id * $Budget - start_off, 0) AS doc_start,
              |  least((seq_id + 1) * $Budget, start_off + n_tokens)
              |    - greatest(seq_id * $Budget, start_off) AS span_len,
              |  greatest(start_off, seq_id * $Budget) - seq_id * $Budget AS seq_start
              |FROM sp ORDER BY source, seq_id, doc_id""".stripMargin)
    ),

    // PK2: packing efficiency per shard — sequences produced, token
    // volume, and the padding waste in the trailing partial sequence
    // (the cost of per-shard independence). One aggregation, no window.
    Q(
      "pk2_packing_efficiency",
      (s, dir) =>
        Tables(s, dir, "documents")
          .select(col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            (ceil(sum(col("n_tokens")).cast("double") / Budget)).cast("long")
              .as("n_sequences"))
          .withColumn("pad_waste",
            col("n_sequences") * Budget - col("total_tokens"))
          .orderBy("source"),
      Some(s"""SELECT source, count(*) AS n_docs,
              |  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
              |  CAST(ceil(CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE) / $Budget) AS BIGINT) AS n_sequences,
              |  CAST(ceil(CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE) / $Budget) AS BIGINT) * $Budget
              |    - CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS pad_waste
              |FROM documents GROUP BY source ORDER BY source""".stripMargin)
    )
  )
}
