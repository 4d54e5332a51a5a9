package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => GenSeed}

/** DuckDB-compatible Jaro-Winkler: known values (cross-checked against
  * `jaro_winkler_similarity` outputs), metric properties, and the
  * codegen path.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinklerSimilarity.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values match DuckDB jaro_winkler_similarity") {
    // constants produced by `SELECT jaro_winkler_similarity(a, b)` in
    // DuckDB on this container; exact doubles, no tolerance
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abcdef", "fedcba") === 0.38888888888888884)
    assert(jw("aaaa", "aaab") === 0.8833333333333334)
    assert(jw("Customer#0001", "Customer#0010") === 0.9846153846153847)
    assert(jw("almond antique blue royal", "almond antique burnished") ===
      0.8998070175438596)
  }

  test("prefix bonus applies only above the 0.7 jaro threshold") {
    // identical 4-prefix but low jaro: no bonus (DuckDB: 0.3888…)
    assert(jw("abcdef", "fedcba") < 0.7)
    // high jaro with shared prefix exceeds the plain jaro score
    val plain = (2.0 / 4 + 2.0 / 4 + 2.0 / 2) / 3 // jaro("ab", "ab") parts
    assert(jw("abcd", "abce") > plain - 1)
  }

  test("metric properties: symmetry, identity, range (pinned-seed inputs)") {
    val gen = Gen.zip(
      Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString),
      Gen.listOf(Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString))
    (0 until 500).foreach { i =>
      val (a, b) = gen.pureApply(Gen.Parameters.default, GenSeed(i.toLong))
      val s = jw(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s === jw(b, a))
      if (a == b && a.nonEmpty) assert(s === 1.0)
    }
  }

  test("dispatch seams: ASCII byte path and equality short-circuit == char kernel") {
    // the UTF-16 char kernel is the reference form; the byte fast path,
    // the byte-equality 1.0 short-circuit, and the non-ASCII fallback
    // must all agree with it exactly
    val alpha = Gen.oneOf(('a' to 'e') ++ Seq(' ', 'Z', '0', 'é', 'ß'))
    val gen = Gen.zip(
      Gen.listOf(alpha).map(_.mkString), Gen.listOf(alpha).map(_.mkString))
    (0 until 2000).foreach { i =>
      val (a0, b0) = gen.pureApply(Gen.Parameters.default, GenSeed(i.toLong))
      // stretch every 5th case across the 64- and 128-char word
      // boundaries of the bit-parallel kernel (and past its 128 cap,
      // which must fall back to the scalar byte path)
      val stretch = i % 5 match {
        case 0 => 1
        case 1 => 3 // ~60-90 chars: straddles the first word boundary
        case 2 => 5 // ~100-150: straddles the 128 cap
        case _ => 1
      }
      val a = a0 * stretch
      val b = if (i % 7 == 0) a else b0 * stretch
      val viaDispatch = jw(a, b)
      val viaChars = JaroWinklerSimilarity.computeChars(a, b)
      // computeChars returns the raw kernel value; empty inputs and the
      // dispatcher agree on 0.0 already
      assert(viaDispatch === viaChars, s"case $i: '$a' vs '$b'")
    }
  }

  test("stays inside whole-stage codegen") {
    GraftFunctions.register(spark)
    val df = spark.range(4)
      .select(concat(lit("txt"), col("id").cast("string")).as("s"))
      .select(call_function(
        GraftFunctions.JaroWinklerName, col("s"), lit("txt1")).as("j"))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("graft.functions.JaroWinklerSimilarity.compute"),
      "expected the static compute call in generated code")
    val got = df.collect().map(_.getDouble(0))
    assert(got.max === 1.0)
  }
}
