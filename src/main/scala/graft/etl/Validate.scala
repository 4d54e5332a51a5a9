package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven data-quality rule engine.
  *
  * Re-expresses the reference's row-level validation framework
  * (`src/data_validation.py:69-100` — a generic `run_check(rows, validator)`
  * loop) as a declarative column builder: each rule is a (pass-predicate,
  * message) pair; failed messages are collected per row, joined with "; ",
  * and the row gets PASS/FAIL status. The report schema matches
  * `src/data_validation.py:178`: Table, Record_ID, Status, Issues (the
  * mutable `Validated_At` wall-clock column is deliberately excluded from
  * query results so output is deterministic; `withTimestamp` adds it for
  * production report parity).
  *
  * Scale note: the whole report is a single narrow projection over the
  * source (no shuffle at all unless the caller pre-joins for referential
  * checks, which is a broadcast-able dim join) — it runs at scan speed on
  * any input size.
  */
object Validate {

  /** A validation rule: `ok` must evaluate TRUE for a clean row; NULL is
    * treated as failure (SQL three-valued logic would otherwise silently
    * pass rows where the predicate can't be evaluated — rules that want
    * null to pass must say `isNull` explicitly). The message may be
    * dynamic (the reference interpolates offending values, e.g.
    * `f"Invalid difficulty: {row.get('difficulty')}"`,
    * src/data_validation.py:114-115).
    */
  final case class Rule(ok: Column, message: Column)

  object Rule {
    def apply(ok: Column, message: String): Rule = Rule(ok, lit(message))
  }

  /** Build a PASS/FAIL report for one table.
    *
    * @param df       input rows (pre-join any lookup tables for orphan checks)
    * @param table    report's Table column value
    * @param recordId expression identifying the row (reference coalesces
    *                 recipe_id/user_id/interaction_id, data_validation.py:78-83)
    * @param rules    ordered rule list; messages join in rule order
    */
  def report(df: DataFrame, table: String, recordId: Column, rules: Seq[Rule]): DataFrame = {
    // concat_ws skips nulls, so a clean row yields "" — same trick keeps the
    // DuckDB oracle expressible with portable SQL.
    val issues = concat_ws(
      "; ",
      rules.map(r => when(!coalesce(r.ok, lit(false)), r.message)): _*)
    df.select(
        lit(table).as("Table"),
        recordId.cast("string").as("Record_ID"),
        issues.as("issues_raw"))
      .select(
        col("Table"),
        col("Record_ID"),
        when(col("issues_raw") === "", "PASS").otherwise("FAIL").as("Status"),
        when(col("issues_raw") === "", "OK").otherwise(col("issues_raw")).as("Issues"))
  }

  /** Production variant carrying the validation wall-clock timestamp
    * (reference `src/data_validation.py:92`). Not used in oracle-compared
    * queries because it is nondeterministic.
    */
  def withTimestamp(report: DataFrame): DataFrame =
    report.withColumn(
      "Validated_At",
      date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss"))

  /** FAIL tallies per table (reference summary, data_validation.py:169-174). */
  def summary(report: DataFrame): DataFrame =
    report.groupBy("Table", "Status").agg(count(lit(1)).as("rows"))
}
