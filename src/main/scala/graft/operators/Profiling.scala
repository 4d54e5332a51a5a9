package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data profiling: per-column statistics of a fact table in ONE scan —
  * the first job every ingest/quality pipeline runs over a new drop.
  *
  * Scale design: the naive profiler scans once per column; this one
  * computes every column's (count, nulls, distinct, min, max, mean) in
  * a single aggregate over a single scan and unpivots the one result
  * row with `stack`. Exact distinct counts over multiple columns make
  * Catalyst plan an Expand (one duplicated stream per distinct column)
  * — still one scan, with map-side partial aggregation per stream; at
  * 100 TB swap `count_distinct` for `approx_count_distinct` (ap1's
  * sketch tier) and the Expand disappears. The mean follows the
  * repo-wide fixed-point convention (StarQueries scaladoc) so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object Profiling {

  private val Columns = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** The 100 TB profile: identical per-column stats with
    * `approx_count_distinct` (HyperLogLog++) replacing the exact
    * multi-column distinct — ONE scan and NO Expand, because sketches
    * merge where exact distinct must deduplicate (dp1's scaladoc swap,
    * now in code; PlanShapeSpec asserts the Expand-free plan). Returns
    * the one wide aggregate row; `rsd` is the sketch's target relative
    * standard deviation (Spark's 0.05 default).
    */
  def approxProfile(df: org.apache.spark.sql.DataFrame,
      columns: Seq[String], rsd: Double = 0.05): org.apache.spark.sql.DataFrame = {
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_n"),
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        approx_count_distinct(col(c), rsd).as(s"${c}_approx"),
        min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max"),
        (sum(round(col(c) * 10000).cast("long")).cast("double") / 10000.0 /
          count(col(c))).as(s"${c}_mean"))
    }
    df.agg(aggs.head, aggs.tail: _*)
  }

  val all: Seq[Q] = Seq(
    Q(
      "dp1_column_profile",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val aggs = Columns.flatMap { c =>
          Seq(
            count(col(c)).as(s"${c}_n"),
            (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
            countDistinct(col(c)).as(s"${c}_distinct"),
            min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"),
            (sum(round(col(c) * 10000).cast("long")).cast("double") / 10000.0 /
              count(col(c))).as(s"${c}_mean"))
        }
        li.agg(aggs.head, aggs.tail: _*)
          .selectExpr(
            s"stack(${Columns.size}, " + Columns.map(c =>
              s"'$c', ${c}_n, ${c}_nulls, ${c}_distinct, ${c}_min, ${c}_max, ${c}_mean")
              .mkString(", ") +
              ") as (col_name, n_values, n_nulls, n_distinct, min_val, max_val, mean_val)")
          .orderBy("col_name")
      },
      Some(Columns.map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(COUNT($c) AS BIGINT) AS n_values,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  MIN($c) AS min_val, MAX($c) AS max_val,
           |  CAST(SUM(CAST(ROUND($c * 10000) AS BIGINT)) AS DOUBLE)/10000.0/COUNT($c) AS mean_val
           |FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
      bench = true
    ),

    // DP3: second-moment statistics (correlation, covariance, stddev)
    // per group — the numeric-relationship half of a column profile.
    // Cross-engine float determinism comes from the repo's fixed-point
    // discipline taken one moment higher: values are scaled to exact
    // integers (quantity as-is, price in cents), the five power sums
    // accumulate EXACTLY (Spark decimal(38,0), DuckDB HUGEINT — a
    // double sum of Σy² ≈ 6e19 would round), and only the final
    // formula runs in IEEE doubles, written operation-for-operation
    // identically in both engines. One scan, one shuffle of 6 numbers
    // per group — the textbook map-side-combinable shape; at 100 TB
    // this is the same cost as a COUNT.
    Q(
      "dp3_numeric_stats",
      (s, dir) => {
        val xi = round(col("l_quantity")).cast("decimal(38,0)")
        val yi = round(col("l_extendedprice") * 100).cast("decimal(38,0)")
        val g = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(xi).as("sx"), sum(yi).as("sy"),
            sum(xi * xi).as("sxx"), sum(yi * yi).as("syy"),
            sum(xi * yi).as("sxy"))
        val cNum = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
        val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
        val nd = col("n").cast("double")
        g.select(
            col("l_returnflag"),
            col("n").as("n_rows"),
            round(cNum / (sqrt(vx) * sqrt(vy)), 6).as("corr_qty_price"),
            // cent-scale back to dollars: xy carries one factor of 100
            round(cNum / (nd * (nd - 1)) / 100.0, 6).as("covar_qty_price"),
            round(sqrt(vx / (nd * (nd - 1))), 6).as("std_qty"),
            round(sqrt(vy / (nd * (nd - 1))) / 100.0, 6).as("std_price"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (
             |  SELECT l_returnflag,
             |    COUNT(*) AS n,
             |    SUM(CAST(ROUND(l_quantity) AS HUGEINT)) AS sx,
             |    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sy,
             |    SUM(CAST(ROUND(l_quantity) AS HUGEINT) * CAST(ROUND(l_quantity) AS HUGEINT)) AS sxx,
             |    SUM(CAST(ROUND(l_extendedprice * 100) AS HUGEINT) * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS syy,
             |    SUM(CAST(ROUND(l_quantity) AS HUGEINT) * CAST(ROUND(l_extendedprice * 100) AS HUGEINT)) AS sxy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |  CAST(n AS BIGINT) AS n_rows,
             |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS corr_qty_price,
             |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)) / 100.0, 6) AS covar_qty_price,
             |  ROUND(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))), 6) AS std_qty,
             |  ROUND(sqrt(CAST(n * syy - sy * sy AS DOUBLE)
             |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100.0, 6) AS std_price
             |FROM g ORDER BY l_returnflag""".stripMargin)),

    // DP2: the sketch-tier profile. The PRODUCT is approxProfile's
    // Expand-free single scan; the exact-distinct branch here exists
    // only to ORACLE it (HLL estimates differ across engines, so the
    // driver-checkable surface is ap1's banded-error shape: exact count
    // + floor(relative error / 0.25), 0 at every profiled column's
    // cardinality under the 5% rsd sketch). Production calls
    // approxProfile alone — one scan, no Expand, mergeable partials.
    Q(
      "dp2_approx_profile",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val approx = approxProfile(li, Columns)
        val exactAggs = Columns.map(c => countDistinct(col(c)).as(s"${c}_exact"))
        val exact = li.agg(exactAggs.head, exactAggs.tail: _*)
        approx.crossJoin(exact)
          .selectExpr(
            s"stack(${Columns.size}, " + Columns.map(c =>
              s"'$c', ${c}_n, ${c}_nulls, ${c}_exact, " +
                s"CAST(FLOOR(ABS(CAST(${c}_approx AS DOUBLE) - ${c}_exact) / ${c}_exact / 0.25) AS INT), " +
                s"${c}_min, ${c}_max, ${c}_mean")
              .mkString(", ") +
              ") as (col_name, n_values, n_nulls, n_distinct, approx_err_band, min_val, max_val, mean_val)")
          .orderBy("col_name")
      },
      Some(Columns.map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(COUNT($c) AS BIGINT) AS n_values,
           |  CAST(COUNT(*) - COUNT($c) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(0 AS INT) AS approx_err_band,
           |  MIN($c) AS min_val, MAX($c) AS max_val,
           |  CAST(SUM(CAST(ROUND($c * 10000) AS BIGINT)) AS DOUBLE)/10000.0/COUNT($c) AS mean_val
           |FROM lineitem""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")))
  )
}
