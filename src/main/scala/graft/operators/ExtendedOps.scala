package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Extension operators beyond the reference's surface (SURVEY.md §7 item
  * 7): sketch aggregation, multi-level rollup, and set operations —
  * standard warehouse capabilities a reference user grows into.
  */
object ExtendedOps {

  val all: Seq[Q] = Seq(
    // HLL sketch: approx_count_distinct next to the exact count. The
    // sketch value is engine-specific, so the oracle checks the exact
    // column and the bounded relative error of the approximation
    // (HLL++ at default rsd=0.05 is well within 10% here).
    Q(
      "ap1_approx_distinct",
      (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("exact_users"),
            (abs(approx_count_distinct(col("user_id")).cast("double") -
              countDistinct(col("user_id"))) /
              countDistinct(col("user_id")) <= 0.1).as("approx_within_10pct"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  true AS approx_within_10pct
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // Multi-level rollup: per (priority, status) with subtotals and a
    // grand total — one pass, no query-per-level.
    Q(
      "a9_rollup_priority_status",
      (s, dir) =>
        Tables(s, dir, "orders")
          .rollup(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(
            asc_nulls_first("o_orderpriority"),
            asc_nulls_first("o_orderstatus")),
      Some("""SELECT o_orderpriority, o_orderstatus, count(*) AS n
             |FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
             |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
    ),

    // Set operations: urgent-order customers minus high-priority overlap,
    // plus the intersection — EXCEPT/INTERSECT with DISTINCT semantics.
    Q(
      "u1_set_ops",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        val high = o.filter(col("o_orderpriority") === "2-HIGH")
          .select(col("o_custkey"))
        urgent.except(high).withColumn("side", lit("urgent_only"))
          .unionAll(urgent.intersect(high).withColumn("side", lit("both")))
          .orderBy("side", "o_custkey")
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, 'urgent_only' AS side FROM
             |    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |     EXCEPT
             |     SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
             |  UNION ALL
             |  SELECT o_custkey, 'both' AS side FROM
             |    (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
             |     INTERSECT
             |     SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'))
             |ORDER BY side, o_custkey""".stripMargin)
    )
  )
}
