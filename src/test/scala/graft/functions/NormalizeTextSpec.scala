package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** NormalizeText semantics, including the non-ASCII cases the ASCII
  * driver corpus cannot exercise. Unicode is written as escapes so the
  * source file can't silently change the test inputs.
  */
class NormalizeTextSpec extends SparkSpec {

  private def norm(s: String): String =
    NormalizeText.compute(UTF8String.fromString(s)).toString

  test("NFC composes combining marks before lowercasing") {
    // "e" + COMBINING ACUTE (U+0301) composes to U+00E9
    assert(norm("e\u0301") === "\u00e9")
    assert(norm("E\u0301") === "\u00e9")
    // already-composed input is untouched (the isNormalized fast path)
    assert(norm("\u00e9") === "\u00e9")
  }

  test("whitespace runs collapse, ends trim, controls drop") {
    assert(norm("  a\t\tb \n c  ") === "a b c")
    assert(norm("a\u0001\u0002bc") === "abc") // C0 controls dropped
    assert(norm("") === "")
    assert(norm(" \t\n ") === "")
  }

  test("lowercase is per-code-point and locale independent") {
    assert(norm("AbC D\u00c9F") === "abc d\u00e9f")
    assert(norm("\u00c4BC") === "\u00e4bc") // A-umlaut lowercases
  }

  test("expression evaluates inside a projection (codegen path)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val out = Seq("  MiXeD\t CASE  ", "plain").toDF("t")
      .select(call_function(GraftFunctions.NormalizeTextName, col("t")))
      .collect().map(_.getString(0))
    assert(out === Array("mixed case", "plain"))
  }
}
