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
  * are strictly positive by algebra; a shared GREATEST(x, minNormal)
  * guard makes a contract VIOLATION fail identically on both engines
  * too — without it Spark's LOG2(0) yields NULL while DuckDB aborts
  * the whole query):
  *
  *   1. seed  e₀ = clamp(⌊log2 x⌋, ±61)   — libm MAY be off by one
  *   2. exact p₀ = 2^e₀                    — integer shift, cast: exact
  *   3. corrected e = e₀ + [x ≥ 2p₀] − [x < p₀], re-clamped — the
  *      comparisons are exact, so BOTH engines land on the same e no
  *      matter whose libm seeded it (a ±1-ulp log2 error moves ⌊·⌋ by
  *      at most one; one correction step restores 2^e ≤ x < 2^(e+1))
  *   4. m = x / 2^e ∈ [1, 2)               — power-of-two divide: exact
  *   5. s = (m−1)/(m+1) ∈ [0, 1/3], t = s²,
  *      ln m = 2·s·Σ_{j=0}^{12} t^j / (2j+1)  (atanh series, Horner;
  *      truncation ≤ 2·(1/3)^27/27 ≈ 1e-14)
  *   6. ln x = e·ln2 + ln m.
  *
  * EVERY numeric literal is written in E-NOTATION: both engines parse
  * scientific notation straight to a correctly-rounded DOUBLE, whereas
  * a plain decimal literal routes through DECIMAL in DuckDB and the
  * DECIMAL→DOUBLE cast DOUBLE-ROUNDS — measured on this container:
  * `0.09090909090909091` (1/11) parses to 0x3fb745d1745d1747 in
  * DuckDB but 0x3fb745d1745d1746 on the JVM, a 1-ulp coefficient gap
  * that flips the final ln bit for ~1e-6 of mantissas (e.g.
  * m = 1.9357933451896252) — exactly the latent hash flake this
  * module exists to kill, reintroduced by literal SYNTAX. All 14
  * literals below are verified to parse bit-identically in e-notation
  * on both engines.
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
  * The expression is STAGED through named columns (x → e₀ → p₀ → e →
  * m → s → t → ln) rather than inlined: the Horner form references t
  * 12 times, the correction references p₀ twice, and s references m
  * twice, so full textual inlining would repeat x hundreds of times —
  * staging keeps both the Spark plan and the oracle SQL linear. Spark
  * callers use [[withLn]]/[[withLp6]] (temporaries dropped); oracle
  * SQL splices [[duckCols]] into a SELECT (DuckDB resolves lateral
  * column aliases left to right, so the stages chain in one SELECT).
  * NOTE the asymmetry: the Duck fragments LEAVE the staged helper
  * columns (`_<out>_x` … `_<out>_t`) in the projection — callers must
  * splice them into an intermediate CTE (as every current caller
  * does), never into the final SELECT of an oracle, or the helper
  * columns become schema the Spark side doesn't have.
  */
object LnExact {

  private val Ln2 = "6.93147180559945286e-01"
  private val MinPos = "2.2250738585072014e-308"

  /** 1/(2j+1) for j = 0..12 in e-notation (see the literal-syntax
    * note above; each string verified to parse to the same bits in
    * DuckDB and on the JVM).
    */
  private val Coefs = Seq(
    "1.00000000000000000e+00", "3.33333333333333315e-01",
    "2.00000000000000011e-01", "1.42857142857142849e-01",
    "1.11111111111111105e-01", "9.09090909090909116e-02",
    "7.69230769230769273e-02", "6.66666666666666657e-02",
    "5.88235294117647051e-02", "5.26315789473684181e-02",
    "4.76190476190476164e-02", "4.34782608695652162e-02",
    "4.00000000000000008e-02")

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

  // ---- staged expression texts (x, e0, p0, e, m, s, t are COLUMN
  //      NAMES — each is referenced a handful of times at most) ----

  private def xExpr(x: String): String =
    s"GREATEST(CAST(($x) AS DOUBLE), $MinPos)"

  private def e0Expr(x: String): String =
    s"CAST(LEAST(GREATEST(FLOOR(LOG2($x)), -61), 61) AS INT)"

  private def eExpr(x: String, e0: String, p0: String): String =
    s"LEAST(GREATEST($e0 + (CASE WHEN $x >= 2.0 * $p0 THEN 1" +
      s" WHEN $x < $p0 THEN -1 ELSE 0 END), -61), 61)"

  private def mExpr(x: String, e: String, duck: Boolean): String =
    s"($x / ${pow2(e, duck)})"

  private def sExpr(m: String): String = s"(($m - 1.0) / ($m + 1.0))"

  private def lnExpr(e: String, s: String, t: String): String =
    s"(CAST($e AS DOUBLE) * $Ln2 + 2.0 * $s * ${horner(t)})"

  /** Spark side: append `out` = ln(x) to `df` through the staged
    * columns (temporaries are dropped). `x` must be strictly positive
    * and finite on every row. The guard literal is built with
    * `Double.parseDouble(MinPos)` so the Spark plan carries the exact
    * bits the oracle's e-notation literal parses to.
    */
  def withLn(df: DataFrame, x: Column, out: String): DataFrame = {
    val p = s"_${out}_"
    df.withColumn(s"${p}x",
        greatest(x.cast("double"), lit(java.lang.Double.parseDouble(MinPos))))
      .withColumn(s"${p}e0", expr(e0Expr(s"${p}x")))
      .withColumn(s"${p}p0", expr(pow2(s"${p}e0", duck = false)))
      .withColumn(s"${p}e", expr(eExpr(s"${p}x", s"${p}e0", s"${p}p0")))
      .withColumn(s"${p}m", expr(mExpr(s"${p}x", s"${p}e", duck = false)))
      .withColumn(s"${p}s", expr(sExpr(s"${p}m")))
      .withColumn(s"${p}t", expr(s"(${p}s * ${p}s)"))
      .withColumn(out, expr(lnExpr(s"${p}e", s"${p}s", s"${p}t")))
      .drop(s"${p}x", s"${p}e0", s"${p}p0", s"${p}e", s"${p}m",
        s"${p}s", s"${p}t")
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
    * in `out` = ln(x). Splice after the other projected columns of an
    * INTERMEDIATE CTE (see the schema-asymmetry note in the object
    * doc) — DuckDB resolves the lateral aliases in order. `x` appears
    * once (in the guarded `_<out>_x` stage).
    */
  def duckCols(x: String, out: String): String = {
    val p = s"_${out}_"
    Seq(
      s"${xExpr(x)} AS ${p}x",
      s"${e0Expr(s"${p}x")} AS ${p}e0",
      s"${pow2(s"${p}e0", duck = true)} AS ${p}p0",
      s"${eExpr(s"${p}x", s"${p}e0", s"${p}p0")} AS ${p}e",
      s"${mExpr(s"${p}x", s"${p}e", duck = true)} AS ${p}m",
      s"${sExpr(s"${p}m")} AS ${p}s",
      s"(${p}s * ${p}s) AS ${p}t",
      s"${lnExpr(s"${p}e", s"${p}s", s"${p}t")} AS $out").mkString(",\n  ")
  }

  /** DuckDB side: staged columns ending in `out` = the lp6 long. */
  def duckLp6Cols(x: String, out: String): String =
    duckCols(x, s"_${out}_raw") +
      s",\n  CAST(ROUND(_${out}_raw * 1000000.0) AS BIGINT) AS $out"
}
