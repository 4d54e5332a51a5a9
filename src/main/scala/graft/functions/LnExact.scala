package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-identical natural log for cross-engine fixed-point scoring.
  *
  * Why this exists: libm `log` is NOT IEEE-correctly-rounded, and the
  * JVM's and DuckDB's (glibc's) implementations measurably disagree —
  * 57 of 200k sampled inputs differ by 1 ulp on this container (the
  * same empirical class as the `pow` divergence that EventOps' ev13
  * fix measured at ~0.1%). Every query that hashes
  * `round(ln(x)·1e6)` therefore carries a latent cross-engine flip:
  * per value the odds are ~3e-4 · (ulp/1e-6) ≈ 1e-12, invisible at
  * test SF but a real flake rate once a corpus evaluates billions of
  * distinct log arguments. The fix is the ev13 pattern: compute ln
  * from ONE shared expression built only of IEEE correctly-rounded
  * ops (+, −, ×, ÷, integer shift, comparisons), so both engines
  * evaluate identical text to identical bits and the question of libm
  * agreement disappears.
  *
  * Construction (x > 0, finite; callers guarantee both — every
  * consumer feeds smoothed count ratios or +0.5-offset uniforms that
  * are strictly positive by algebra):
  *
  *   1. seed  e₀ = clamp(⌊log2 x⌋, ±61)   — libm MAY be off by one
  *   2. exact p₀ = 2^e₀                    — integer shift, cast: exact
  *   3. corrected e = e₀ + [x ≥ 2p₀] − [x < p₀], re-clamped — the
  *      comparisons are exact, so BOTH engines land on the same e no
  *      matter whose libm seeded it (a ±1-ulp log2 error moves ⌊·⌋ by
  *      at most one; one correction step restores 2^e ≤ x < 2^(e+1))
  *   4. m = x / 2^e ∈ [1, 2)               — power-of-two divide: exact
  *   5. s = (m−1)/(m+1) ∈ [0, 1/3],
  *      ln m = 2·s·Σ_{j=0}^{12} s^(2j) / (2j+1)  (atanh series, Horner;
  *      truncation ≤ 2·(1/3)^27/27 ≈ 1e-14)
  *   6. ln x = e·ln2 + ln m, with ln2 as a full-precision literal —
  *      both engines' literal parsers are correctly rounded, so the
  *      constant is the identical bits (ev13's coefficient argument).
  *
  * Accuracy vs true ln: < 1e-13 absolute over |log2 x| ≤ 61 — five
  * decades under the 1e-6 fixed-point quantum. Outside that domain
  * (x < 2^-61 ≈ 4e-19, i.e. probabilities rarer than 1-in-2e18) the
  * clamp degrades accuracy gracefully but both engines still agree
  * bit-for-bit, which is the property the hash needs.
  *
  * Dialect surface: the ONLY text that differs per engine is the
  * power-of-two shift (`shiftleft(1L, k)` vs `1::BIGINT << k`) — an
  * exact integer op either way. Everything else is shared verbatim.
  *
  * The expression is STAGED through named columns (e₀ → e → m → s →
  * ln) rather than inlined: the Horner form references s 13 times and
  * s references m twice, so full textual inlining would repeat x
  * ~800× — staging keeps both the Spark plan and the oracle SQL
  * linear. Spark callers use [[withLn]]/[[withLp6]]; oracle SQL
  * splices [[duckCols]] into a SELECT (DuckDB resolves lateral column
  * aliases left to right, so the five stages chain in one SELECT).
  */
object LnExact {

  private val Ln2 = "0.6931471805599453"

  /** 1/(2j+1) for j = 0..12, printed to full double precision. */
  private val Coefs = Seq(
    "1.0", "0.3333333333333333", "0.2", "0.14285714285714285",
    "0.1111111111111111", "0.09090909090909091", "0.07692307692307693",
    "0.06666666666666667", "0.058823529411764705", "0.05263157894736842",
    "0.047619047619047616", "0.043478260869565216", "0.04")

  private def horner(t: String): String =
    Coefs.reverse.reduce((acc, c) => s"($acc * $t + $c)")

  private def shlSpark(k: String): String = s"shiftleft(CAST(1 AS BIGINT), $k)"
  private def shlDuck(k: String): String = s"(CAST(1 AS BIGINT) << ($k))"

  /** Exact 2^e for e ∈ [−61, 61]: shift for e ≥ 0, reciprocal shift
    * (exact — a power-of-two reciprocal) below.
    */
  private def pow2(e: String, duck: Boolean): String = {
    val shl = if (duck) shlDuck _ else shlSpark _
    s"(CASE WHEN ($e) >= 0 THEN CAST(${shl(e)} AS DOUBLE)" +
      s" ELSE 1.0 / CAST(${shl(s"-($e)")} AS DOUBLE) END)"
  }

  // ---- staged expression texts (x, e0, e, m, s are COLUMN NAMES or
  //      cheap expressions — each is referenced a handful of times) ----

  private def e0Expr(x: String): String =
    s"CAST(LEAST(GREATEST(FLOOR(LOG2($x)), -61), 61) AS INT)"

  private def eExpr(x: String, e0: String, duck: Boolean): String = {
    val p0 = pow2(e0, duck)
    s"LEAST(GREATEST($e0 + (CASE WHEN $x >= 2.0 * $p0 THEN 1" +
      s" WHEN $x < $p0 THEN -1 ELSE 0 END), -61), 61)"
  }

  private def mExpr(x: String, e: String, duck: Boolean): String =
    s"($x / ${pow2(e, duck)})"

  private def sExpr(m: String): String = s"(($m - 1.0) / ($m + 1.0))"

  private def lnExpr(e: String, s: String): String =
    s"(CAST($e AS DOUBLE) * $Ln2 + 2.0 * $s * ${horner(s"($s * $s)")})"

  /** Spark side: append `out` = ln(x) to `df` through the five staged
    * columns (temporaries are dropped). `x` must be strictly positive
    * and finite on every row.
    */
  def withLn(df: DataFrame, x: Column, out: String): DataFrame = {
    val p = s"_${out}_"
    df.withColumn(s"${p}x", x.cast("double"))
      .withColumn(s"${p}e0", expr(e0Expr(s"${p}x")))
      .withColumn(s"${p}e", expr(eExpr(s"${p}x", s"${p}e0", duck = false)))
      .withColumn(s"${p}m", expr(mExpr(s"${p}x", s"${p}e", duck = false)))
      .withColumn(s"${p}s", expr(sExpr(s"${p}m")))
      .withColumn(out, expr(lnExpr(s"${p}e", s"${p}s")))
      .drop(s"${p}x", s"${p}e0", s"${p}e", s"${p}m", s"${p}s")
  }

  /** Spark side: `out` = round(ln(x)·1e6) as a long — the
    * order-independent fixed-point log-prob unit (tx14's convention).
    */
  def withLp6(df: DataFrame, x: Column, out: String): DataFrame =
    withLn(df, x, s"_${out}_raw")
      .withColumn(out,
        round(col(s"_${out}_raw") * 1000000.0).cast("long"))
      .drop(s"_${out}_raw")

  /** DuckDB side: the staged columns as a SELECT-list fragment ending
    * in `out` = ln(x). Splice after the other projected columns of a
    * CTE — DuckDB resolves the lateral aliases in order. `x` is
    * repeated five times, so pass a column name or a short expression.
    */
  def duckCols(x: String, out: String): String = {
    val p = s"_${out}_"
    Seq(
      s"${e0Expr(x)} AS ${p}e0",
      s"${eExpr(x, s"${p}e0", duck = true)} AS ${p}e",
      s"${mExpr(x, s"${p}e", duck = true)} AS ${p}m",
      s"${sExpr(s"${p}m")} AS ${p}s",
      s"${lnExpr(s"${p}e", s"${p}s")} AS $out").mkString(",\n  ")
  }

  /** DuckDB side: staged columns ending in `out` = the lp6 long. */
  def duckLp6Cols(x: String, out: String): String =
    duckCols(x, s"_${out}_raw") +
      s",\n  CAST(ROUND(_${out}_raw * 1000000.0) AS BIGINT) AS $out"
}
