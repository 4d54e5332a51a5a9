package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Change-data-capture and dimension-merge operators — the warehouse
  * half of an incremental lake. The reference's load path is
  * WRITE_TRUNCATE-per-table (`bigquery_loader_function/main.py:36-45`):
  * every refresh replaces the table wholesale. That is exactly right at
  * its scale and exactly wrong at 100 TB, where a nightly full rewrite
  * of a 10 TB dimension is the bottleneck. These operators are the
  * incremental replacements:
  *
  *   - `cd1_snapshot_diff` turns two full snapshots into a row-level
  *     changelog (insert/update/delete) — the CDC extraction that feeds
  *     every downstream incremental consumer.
  *   - `mg1_scd2_merge` applies an update batch to a versioned
  *     dimension (slowly-changing-dimension type 2): matched keys close
  *     their current row and open a new version, unmatched keys insert.
  *
  * Scale shape. The diff is ONE full-outer shuffle join on the key —
  * with both snapshots stored bucketed on that key (ScaleTechniques'
  * bucketed-join layout) it degrades to a zero-shuffle zip of
  * co-located partitions. Rows are compared here on the payload column
  * directly; for wide rows, compare an md5/xxhash payload digest
  * computed at write time so the diff never deserializes cold columns.
  * The SCD2 merge is a single LEFT join of the dimension against the
  * (small) update-batch keys — broadcast, so the 10 TB side never
  * shuffles — plus a union of the opened versions: each history row is
  * written exactly once, no per-row state machine. Version stamps are
  * data-carried (batch ids), never wall-clock, so reruns are
  * bit-identical (same property the Seed generator relies on).
  */
object ChangeCapture {

  /** Snapshot A (yesterday's order book): every 7th key missing. */
  def snapshotA(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "orders").select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") % 7 =!= 0)

  /** Snapshot B (today's): every 5th key missing, every 3rd repriced. */
  def snapshotB(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables(s, dir, "orders").select("o_orderkey", "o_totalprice")
      .filter(col("o_orderkey") % 5 =!= 0)
      .select(
        col("o_orderkey"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")).as("o_totalprice"))

  /** The A→B changelog: one full-outer join, unchanged rows dropped. */
  def changelog(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    snapshotA(s, dir).alias("a")
      .join(snapshotB(s, dir).alias("b"),
        col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      .filter(
        col("a.o_orderkey").isNull || col("b.o_orderkey").isNull ||
          col("a.o_totalprice") =!= col("b.o_totalprice"))
      .select(
        coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
        when(col("a.o_orderkey").isNull, "insert")
          .when(col("b.o_orderkey").isNull, "delete")
          .otherwise("update").as("change_type"),
        col("a.o_totalprice").as("old_price"),
        col("b.o_totalprice").as("new_price"))

  val all: Seq[Q] = Seq(
    // CDC: diff two order-book snapshots into a changelog. Snapshot A
    // (yesterday) drops every 7th key; snapshot B (today) drops every
    // 5th and reprices every 3rd — the surviving intersection classifies
    // as update-or-unchanged, the asymmetric differences as
    // delete/insert. Unchanged rows are filtered out BEFORE the
    // projection so the changelog is proportional to churn, not to
    // table size.
    Q(
      "cd1_snapshot_diff",
      (s, dir) => changelog(s, dir).orderBy("o_orderkey"),
      Some("""WITH a AS (
             |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
             |b AS (
             |  SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 10
             |         ELSE o_totalprice END AS o_totalprice
             |  FROM orders WHERE o_orderkey % 5 <> 0)
             |SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
             |       WHEN b.o_orderkey IS NULL THEN 'delete'
             |       ELSE 'update' END AS change_type,
             |  a.o_totalprice AS old_price,
             |  b.o_totalprice AS new_price
             |FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
             |WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
             |   OR a.o_totalprice <> b.o_totalprice
             |ORDER BY o_orderkey""".stripMargin)
    ),

    // SCD2 merge: version-2 batch into the customer dimension. The
    // batch holds repriced balances for keys ending 0/1 and brand-new
    // members (offset keys). History layout: every key keeps its v1 row
    // (closed with valid_to=2 iff the batch touched it) and touched/new
    // keys add an open v2 row. Exactly one is_current row per key —
    // asserted in ChangeCaptureSpec.
    Q(
      "mg1_scd2_merge",
      (s, dir) => {
        val cust = Tables(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal")
        val batch = cust.filter(col("c_custkey") % 10 < 2)
          .select(
            col("c_custkey"),
            col("c_name"),
            (col("c_acctbal") + 100).as("c_acctbal"))
          .unionAll(
            cust.filter(col("c_custkey") % 10 === 5)
              .select(
                (col("c_custkey") + 1000000L).as("c_custkey"),
                concat(lit("NEW:"), col("c_name")).as("c_name"),
                lit(0.0).as("c_acctbal")))
        // dim ⋈ batch-keys LEFT (broadcast: the update batch is the
        // small side by construction) — one pass over the dimension.
        val touched = broadcast(batch.select(col("c_custkey").as("bk")))
        val history = cust.join(touched, col("c_custkey") === col("bk"), "left")
          .select(
            col("c_custkey"), col("c_name"), col("c_acctbal"),
            lit(1).as("valid_from"),
            when(col("bk").isNotNull, lit(2)).cast("int").as("valid_to"),
            col("bk").isNull.as("is_current"))
        val opened = batch.select(
          col("c_custkey"), col("c_name"), col("c_acctbal"),
          lit(2).as("valid_from"),
          lit(null).cast("int").as("valid_to"),
          lit(true).as("is_current"))
        history.unionAll(opened).orderBy("c_custkey", "valid_from")
      },
      Some("""WITH batch AS (
             |  SELECT c_custkey, c_name, c_acctbal + 100 AS c_acctbal
             |  FROM customer WHERE c_custkey % 10 < 2
             |  UNION ALL
             |  SELECT c_custkey + 1000000, 'NEW:' || c_name, CAST(0.0 AS DOUBLE)
             |  FROM customer WHERE c_custkey % 10 = 5)
             |SELECT t.c_custkey, t.c_name, t.c_acctbal,
             |  1 AS valid_from,
             |  CASE WHEN b.c_custkey IS NOT NULL THEN 2 END AS valid_to,
             |  b.c_custkey IS NULL AS is_current
             |FROM customer t LEFT JOIN batch b ON t.c_custkey = b.c_custkey
             |UNION ALL
             |SELECT c_custkey, c_name, c_acctbal, 2, NULL, true FROM batch
             |ORDER BY c_custkey, valid_from""".stripMargin)
    )
  )
}
