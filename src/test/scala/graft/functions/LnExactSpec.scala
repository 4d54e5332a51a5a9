package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[LnExact]]'s contract: accuracy far inside the 1e-6
  * fixed-point quantum over the documented domain, exactness at
  * power-of-two boundaries (where the ±1 seed correction must land on
  * the same exponent no matter which way libm's log2 leans), and
  * graceful (finite) degradation outside the clamp range. Cross-engine
  * bit-identity needs identical TEXT *and* identical literal PARSING —
  * a plain decimal literal routes through DECIMAL in DuckDB and
  * double-rounds (the 1/11 coefficient measurably diverged by 1 ulp
  * before the e-notation rewrite; see the object doc), which is why
  * every literal is e-notation and why the mantissas that exposed the
  * gap are pinned below. The sf0.01 gate verifies the cross-engine
  * half end to end on every converted row.
  */
class LnExactSpec extends SparkSpec {

  private def lnOf(xs: Seq[Double]): Seq[(Double, Double)] = {
    import spark.implicits._
    val df = xs.toDF("x")
    LnExact.withLn(df, col("x"), "lnx")
      .collect().toSeq.map(r => (r.getDouble(0), r.getDouble(1)))
  }

  test("accuracy < 1e-12 absolute across the full clamp domain") {
    // deterministic xorshift mantissas spread over 2^-61 .. 2^61
    var s = 0x9e3779b97f4a7c15L
    val xs = (0 until 4000).map { i =>
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      val u = (s >>> 11) * math.pow(2, -53) // uniform (0,1)
      val e = (i % 123) - 61 // exponents -61..61
      (1.0 + u) * math.pow(2.0, e.toDouble)
    }.filter(x => x > 0 && java.lang.Double.isFinite(x))
    val rows = lnOf(xs)
    rows.foreach { case (x, got) =>
      val want = math.log(x)
      assert(math.abs(got - want) < 1e-12,
        s"x=$x got=$got want=$want diff=${got - want}")
    }
  }

  test("power-of-two boundaries: exact at 2^k, stable one ulp either side") {
    val pows = Seq(-61, -40, -7, -1, 0, 1, 13, 61).map(k => math.pow(2.0, k))
    val xs = pows.flatMap(p =>
      Seq(p, Math.nextUp(p), Math.nextDown(p))).filter(_ > 0)
    lnOf(xs).foreach { case (x, got) =>
      val want = math.log(x)
      assert(math.abs(got - want) < 1e-12, s"x=$x got=$got want=$want")
      // at exactly 2^k the reduction must yield m=1 → ln m term = 0,
      // so the result is k·ln2 with one multiply: bit-exact vs that
      if (pows.contains(x)) {
        val k = math.round(math.log(x) / math.log(2.0)).toInt
        assert(got == k * 0.6931471805599453, s"2^$k not exact: $got")
      }
    }
  }

  test("ratio-of-counts inputs (the consumer shape) stay under 1e-13") {
    // smoothed probabilities and BM25-style idf arguments
    val xs = Seq(
      1.0 / 3.0, 2.0 / 7.0, 1.0 / 1000003.0, 999999.0 / 1000000.0,
      (5.0 + 0.5) / (2.0 + 0.5) + 1.0, 1.0 / 4294967296.0, 0.5 / 4294967296.0,
      1.0, 2.0, 1.5, 6.02e5)
    lnOf(xs).foreach { case (x, got) =>
      assert(math.abs(got - math.log(x)) < 1e-13, s"x=$x got=$got")
    }
  }

  test("the coefficient-divergence mantissas evaluate correctly rounded") {
    // these mantissas flip their last ln bit under the 1-ulp 1/11
    // coefficient gap the plain-decimal literal syntax produced in
    // DuckDB — pinned so a literal-format regression shows up as an
    // accuracy drift here even before the oracle gate runs
    val ms = Seq(1.9357933451896252, 1.9777353022631847, 1.9109090627249965)
    val xs = ms.flatMap(m => Seq(m, m * 1024.0, m / 1024.0))
    lnOf(xs).foreach { case (x, got) =>
      assert(math.abs(got - math.log(x)) < 1e-13, s"x=$x got=$got")
    }
  }

  test("outside the clamp domain the value is finite (and documented wrong)") {
    lnOf(Seq(1e-300, 1e300)).foreach { case (x, got) =>
      assert(java.lang.Double.isFinite(got), s"x=$x got=$got")
    }
  }

  test("withLp6 is round(ln·1e6) as a long") {
    import spark.implicits._
    val df = Seq(0.5, 0.1, 1.0, 123.456).toDF("x")
    val got = LnExact.withLp6(df, col("x"), "lp6")
      .collect().toSeq.map(r => (r.getDouble(0), r.getLong(1)))
    got.foreach { case (x, lp) =>
      assert(lp == math.round(math.log(x) * 1e6),
        s"x=$x lp6=$lp want=${math.round(math.log(x) * 1e6)}")
    }
  }
}
