package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
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
        // exact integer power sums as three 21-bit long limb sums per
        // term (recombined per group) — dp5's BigDecimal-avoidance
        // trick; values fit longs (qty ≤ 50, cents ≤ ~1e7), products
        // fit longs, limb sums hold to 2^42 rows per group
        val xi = round(col("l_quantity")).cast("long")
        val yi = round(col("l_extendedprice") * 100).cast("long")
        val M21 = (1L << 21) - 1
        def limbs(prod: org.apache.spark.sql.Column, name: String) = Seq(
          sum(shiftright(prod, 42)).as(s"${name}__h"),
          sum(shiftright(prod, 21).bitwiseAND(lit(M21))).as(s"${name}__m"),
          sum(prod.bitwiseAND(lit(M21))).as(s"${name}__l"))
        def dec(name: String) =
          (col(s"${name}__h").cast("decimal(38,0)") * lit(1L << 42) +
            col(s"${name}__m").cast("decimal(38,0)") * lit(1L << 21) +
            col(s"${name}__l").cast("decimal(38,0)")).as(name)
        val terms = Seq("sx" -> xi, "sy" -> yi, "sxx" -> (xi * xi),
          "syy" -> (yi * yi), "sxy" -> (xi * yi))
        val aggs = Seq(count(lit(1)).as("n")) ++
          terms.flatMap { case (nm, p) => limbs(p, nm) }
        val g = Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(aggs.head, aggs.tail: _*)
          .select(Seq(col("l_returnflag"), col("n")) ++
            terms.map { case (nm, _) => dec(nm) }: _*)
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
  ,

    // DP4: distribution-drift profile — Population Stability Index of
    // `value` per event_type between two event populations (even vs odd
    // event_id — the deterministic stand-in for reference-window vs
    // current-window). The shape every production training pipeline
    // runs on each new data drop: histogram both populations on a FIXED
    // binning, then PSI = Σ (p_b - q_b)·ln(p_b / q_b) flags columns
    // whose distribution moved (>0.25 = investigate).
    //
    // Scale: one scan + one (event_type, bin) count shuffle of 10 rows
    // per type per side — COUNT-class cost at 100 TB. The global
    // [min,max] is a single-row scalar aggregate (broadcast cross-join,
    // the q4 pattern). Cross-engine float determinism: the bin edges
    // and smoothed ratios are pure IEEE arithmetic both engines compute
    // identically; only ln() is libm-variable, so each bin's PSI term
    // is quantized to micro-units BEFORE the sum (tx14's fixed-point
    // discipline) and the final score rounds to 6 places. Bins empty in
    // BOTH populations are skipped identically by both engines (they
    // never appear in the grouped counts); smoothing (+0.5 per bin,
    // +5.0 = +0.5·10 per total) keeps one-sided-empty bins finite.
    Q(
      "dp4_drift_profile",
      (s, dir) => {
        val nBins = 10
        val ev = Tables(s, dir, "events").filter(col("value").isNotNull)
        val mm = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
        val binned = ev.crossJoin(broadcast(mm))
          .select(
            col("event_type"),
            (col("event_id") % 2 === 0).as("is_ref"),
            least(floor((col("value") - col("lo")) /
              ((col("hi") - col("lo")) / nBins.toDouble)), lit((nBins - 1).toDouble))
              .cast("int").as("bin"))
        val counts = binned.groupBy(col("event_type"), col("bin"))
          .agg(
            sum(when(col("is_ref"), 1L).otherwise(0L)).as("r"),
            sum(when(!col("is_ref"), 1L).otherwise(0L)).as("c"))
        // per-type totals as a WINDOW over the already-grouped counts
        // (≤ nBins rows per type), not a totals-join — a join branch
        // would recompute the counts subtree and scan events twice
        val w = Window.partitionBy(col("event_type"))
        val p = (col("r").cast("double") + 0.5) / (col("nr").cast("double") + 5.0)
        val q = (col("c").cast("double") + 0.5) / (col("nc").cast("double") + 5.0)
        // ln(p/q) through LnExact (libm-free; p, q strictly positive
        // by the +0.5 smoothing) — the staged ln runs on ≤ nBins rows
        // per type, never on events
        graft.functions.LnExact.withLn(
          counts
            .withColumn("nr", sum(col("r")).over(w))
            .withColumn("nc", sum(col("c")).over(w)),
          p / q, "lnpq")
          .select(
            col("event_type"), col("nr"), col("nc"),
            round((p - q) * col("lnpq") * 1000000.0).cast("long").as("t6"))
          .groupBy(col("event_type"))
          .agg(
            max(col("nr")).as("n_ref"),
            max(col("nc")).as("n_cur"),
            round(sum(col("t6")).cast("double") / 1000000.0, 6).as("psi"))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (SELECT * FROM events WHERE value IS NOT NULL),
             |mm AS (SELECT min(value) AS lo, max(value) AS hi FROM ev),
             |b AS (
             |  SELECT event_type, event_id % 2 = 0 AS is_ref,
             |    CAST(LEAST(FLOOR((value - lo) / ((hi - lo) / 10.0)), 9.0) AS INT) AS bin
             |  FROM ev CROSS JOIN mm),
             |cnt AS (
             |  SELECT event_type, bin,
             |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r,
             |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS c
             |  FROM b GROUP BY event_type, bin),
             |tot AS (
             |  SELECT event_type, bin, r, c,
             |    SUM(r) OVER (PARTITION BY event_type) AS nr,
             |    SUM(c) OVER (PARTITION BY event_type) AS nc
             |  FROM cnt),
             |terms AS (
             |  SELECT event_type, nr, nc,
             |    ${graft.functions.LnExact.duckCols(
                    "(((CAST(r AS DOUBLE) + 0.5) / (CAST(nr AS DOUBLE) + 5.0)) " +
                      "/ ((CAST(c AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 5.0)))",
                    "lnpq")},
             |    CAST(ROUND(((CAST(r AS DOUBLE) + 0.5) / (CAST(nr AS DOUBLE) + 5.0)
             |              - (CAST(c AS DOUBLE) + 0.5) / (CAST(nc AS DOUBLE) + 5.0))
             |      * lnpq
             |      * 1000000.0) AS BIGINT) AS t6
             |  FROM tot)
             |SELECT event_type,
             |  CAST(MAX(nr) AS BIGINT) AS n_ref,
             |  CAST(MAX(nc) AS BIGINT) AS n_cur,
             |  ROUND(CAST(SUM(t6) AS DOUBLE) / 1000000.0, 6) AS psi
             |FROM terms GROUP BY event_type ORDER BY event_type""".stripMargin)
    ),

    // DP5: full pairwise correlation matrix of the profiled columns in
    // ONE scan — every per-column and cross-column power sum rides a
    // single wide aggregate (no per-pair passes, no Expand), and the 6
    // Pearson coefficients are derived from those exact integer sums in
    // a one-row projection before `stack` unpivots them. Same
    // determinism contract as dp3: sums are exact integers, the float
    // math is a fixed expression over exact inputs, so the oracle
    // matches bit-for-bit. At 100 TB the scan is the cost; the
    // aggregate state is O(columns²) longs.
    //
    // The exact sums accumulate as THREE 21-bit LONG LIMB sums per
    // term, recombined into one decimal per limb-triple on the single
    // output row — not as decimal(38,0) sums: every per-row decimal
    // product runs on the BigDecimal path (measured: 2.5 task-s for
    // 600k rows; the limb form 0.3), while the limb split is three
    // codegen'd long shifts/adds. Exactness: each scaled value ≤ 1e9,
    // so products fit a long exactly; limb sums stay below 2^63 up to
    // 2^42 (~4.4e12) rows — an order of magnitude above a 100 TB
    // lineitem; beyond that, widen to a fourth limb.
    Q(
      "dp5_correlation_matrix",
      (s, dir) => {
        def xi(c: String) = round(col(c) * 10000).cast("long")
        val M21 = (1L << 21) - 1
        // three long limb sums of an exact long product
        def limbs(prod: org.apache.spark.sql.Column, name: String) = Seq(
          sum(shiftright(prod, 42)).as(s"${name}__h"),
          sum(shiftright(prod, 21).bitwiseAND(lit(M21))).as(s"${name}__m"),
          sum(prod.bitwiseAND(lit(M21))).as(s"${name}__l"))
        // recombine: hi·2^42 + mid·2^21 + lo, exact in decimal(38,0)
        def dec(name: String) =
          (col(s"${name}__h").cast("decimal(38,0)") * lit(1L << 42) +
            col(s"${name}__m").cast("decimal(38,0)") * lit(1L << 21) +
            col(s"${name}__l").cast("decimal(38,0)")).as(name)
        val pairs = Columns.combinations(2).map(p => (p(0), p(1))).toSeq
        val aggs = Seq(count(lit(1)).as("n")) ++
          Columns.flatMap(c => limbs(xi(c), s"s_$c")) ++
          Columns.flatMap(c => limbs(xi(c) * xi(c), s"ss_$c")) ++
          pairs.flatMap { case (a, b) => limbs(xi(a) * xi(b), s"sp_${a}_$b") }
        val g = Tables(s, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
          .select(Seq(col("n")) ++
            Columns.map(c => dec(s"s_$c")) ++
            Columns.map(c => dec(s"ss_$c")) ++
            pairs.map { case (a, b) => dec(s"sp_${a}_$b") }: _*)
        def corrExpr(a: String, b: String): String =
          s"ROUND(CAST(n * sp_${a}_$b - s_$a * s_$b AS DOUBLE) / " +
            s"(SQRT(CAST(n * ss_$a - s_$a * s_$a AS DOUBLE)) * " +
            s"SQRT(CAST(n * ss_$b - s_$b * s_$b AS DOUBLE))), 6)"
        g.selectExpr(
            "n",
            s"stack(${pairs.size}, " + pairs.map { case (a, b) =>
              s"'$a', '$b', ${corrExpr(a, b)}"
            }.mkString(", ") + ") as (col_a, col_b, corr)")
          .select(col("col_a"), col("col_b"), col("n").as("n_rows"), col("corr"))
          .orderBy("col_a", "col_b")
      },
      Some {
        val pairs = Columns.combinations(2).map(p => (p(0), p(1))).toSeq
        def hx(c: String) = s"CAST(ROUND($c * 10000) AS HUGEINT)"
        pairs.map { case (a, b) =>
          s"""SELECT '$a' AS col_a, '$b' AS col_b,
             |  CAST(COUNT(*) AS BIGINT) AS n_rows,
             |  ROUND(CAST(COUNT(*) * SUM(${hx(a)} * ${hx(b)}) - SUM(${hx(a)}) * SUM(${hx(b)}) AS DOUBLE) /
             |    (SQRT(CAST(COUNT(*) * SUM(${hx(a)} * ${hx(a)}) - SUM(${hx(a)}) * SUM(${hx(a)}) AS DOUBLE)) *
             |     SQRT(CAST(COUNT(*) * SUM(${hx(b)} * ${hx(b)}) - SUM(${hx(b)}) * SUM(${hx(b)}) AS DOUBLE))), 6) AS corr
             |FROM lineitem""".stripMargin
        }.mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")
      }
    )
  )
}
