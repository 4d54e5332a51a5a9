package graft.operators

import graft.{Q, Tables}
import graft.etl.Validate
import graft.etl.Validate.Rule
import org.apache.spark.sql.functions._

/** Oracle-checked instantiations of the Validate rule engine (SURVEY.md §2.8
  * F1–F8 and §2.5 A7) over the driver testdata. Mirrors the reference's
  * per-table validators (`src/data_validation.py:104-166`): required fields,
  * positivity, enum domains, and referential-integrity (orphan) checks, with
  * the "; "-joined issue list and PASS/FAIL status of
  * `src/data_validation.py:75,91`.
  */
object ValidationQueries {

  private def ordersReport(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer").select(col("c_custkey"))
    // Broadcast the dim for the orphan check: at 100 TB the fact side
    // streams through map-side; no shuffle.
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
    Validate.report(
      joined,
      "orders",
      col("o_orderkey"),
      Seq(
        Rule(col("o_totalprice") > 0, "Invalid totalprice"),
        Rule(col("o_orderstatus").isin("O", "F", "P"), "Invalid status"),
        Rule(col("o_totalprice") <= 400000, "Totalprice above cap"),
        Rule(col("c_custkey").isNotNull, "Orphaned custkey")))
  }

  private def lineitemReport(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val li = Tables(s, dir, "lineitem")
    Validate.report(
      li,
      "lineitem",
      concat_ws("-", col("l_orderkey"), col("l_linenumber")),
      Seq(
        Rule(col("l_quantity") > 0, "Invalid quantity"),
        Rule(col("l_quantity") <= 40, "Quantity above cap"),
        Rule(col("l_discount") >= 0 && col("l_discount") <= 0.08, "Discount out of range"),
        Rule(col("l_returnflag").isin("A", "N", "R"), "Invalid returnflag")))
  }

  // DuckDB mirror of Validate.report: concat_ws skips NULLs in both engines,
  // so a clean row produces '' → PASS/OK.
  private val ordersReportSql =
    """SELECT 'orders' AS "Table", CAST(o_orderkey AS VARCHAR) AS Record_ID,
      |  CASE WHEN issues_raw = '' THEN 'PASS' ELSE 'FAIL' END AS Status,
      |  CASE WHEN issues_raw = '' THEN 'OK' ELSE issues_raw END AS Issues
      |FROM (
      |  SELECT o_orderkey, concat_ws('; ',
      |    CASE WHEN NOT (o_totalprice > 0) THEN 'Invalid totalprice' END,
      |    CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 'Invalid status' END,
      |    CASE WHEN NOT (o_totalprice <= 400000) THEN 'Totalprice above cap' END,
      |    CASE WHEN c_custkey IS NULL THEN 'Orphaned custkey' END) AS issues_raw
      |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey)""".stripMargin

  private val lineitemReportSql =
    """SELECT 'lineitem' AS "Table", concat_ws('-', l_orderkey, l_linenumber) AS Record_ID,
      |  CASE WHEN issues_raw = '' THEN 'PASS' ELSE 'FAIL' END AS Status,
      |  CASE WHEN issues_raw = '' THEN 'OK' ELSE issues_raw END AS Issues
      |FROM (
      |  SELECT l_orderkey, l_linenumber, concat_ws('; ',
      |    CASE WHEN NOT (l_quantity > 0) THEN 'Invalid quantity' END,
      |    CASE WHEN NOT (l_quantity <= 40) THEN 'Quantity above cap' END,
      |    CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.08) THEN 'Discount out of range' END,
      |    CASE WHEN NOT (l_returnflag IN ('A','N','R')) THEN 'Invalid returnflag' END) AS issues_raw
      |  FROM lineitem)""".stripMargin

  val all: Seq[Q] = Seq(
    // F5/F6/F7 + J5-as-flag: the full row-level report for two tables.
    Q(
      "f6_validation_report",
      (s, dir) =>
        ordersReport(s, dir)
          .unionAll(lineitemReport(s, dir))
          // bare orderBy: the report is a row-local projection, so the
          // sort's range-sampling pass re-runs only the scan + the two
          // sort-key columns — Catalyst prunes the wide Issues build
          // out of the sampling job, while a persist materialized the
          // full 750k-row string report into the cache and read it
          // back twice (measured at sf0.1/32: 4.2 task-s with the
          // persist, 2.3 bare)
          .orderBy("Table", "Record_ID"),
      Some(
        s"""SELECT * FROM ($ordersReportSql UNION ALL $lineitemReportSql)
           |ORDER BY "Table", Record_ID""".stripMargin)
    ),

    // A7: report tallies (reference error summary, data_validation.py:169-174).
    Q(
      "a7_validation_summary",
      (s, dir) =>
        Validate.summary(ordersReport(s, dir).unionAll(lineitemReport(s, dir)))
          .orderBy("Table", "Status"),
      Some(
        s"""SELECT "Table", Status, count(*) AS rows
           |FROM ($ordersReportSql UNION ALL $lineitemReportSql)
           |GROUP BY "Table", Status ORDER BY "Table", Status""".stripMargin)
    )
  )
}
