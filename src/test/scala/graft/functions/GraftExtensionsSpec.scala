package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** GraftExtensions must inject ALL native functions — a session built only
  * `withExtensions` (no `GraftFunctions.register` call) gets the same
  * surface. `newSession()` rebuilds the SessionState from the injected
  * extension list with a fresh FunctionRegistry, so any name resolving
  * there proves injection (not a leaked `register` from another suite).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-built session resolves all four graft functions") {
    val fresh = spark.newSession()
    val names = Seq(
      GraftFunctions.DotName, GraftFunctions.IntersectName,
      GraftFunctions.BottomKName, GraftFunctions.RollingHashName)
    names.foreach { n =>
      assert(
        fresh.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)),
        s"$n missing from extension-injected registry")
    }
  }

  test("graft_rolling_hash works via extensions alone") {
    val fresh = spark.newSession()
    import fresh.implicits._
    val out = Seq("abcd").toDF("t")
      .select(call_function(GraftFunctions.RollingHashName,
        col("t"), lit(2), lit(257L), lit(1000000007L)).as("w"))
      .as[Seq[Long]].head()
    // h("ab") = 97*257 + 98, etc. — 3 windows for a 4-byte string, k=2
    assert(out === Seq("ab", "bc", "cd").map(s =>
      (s(0).toLong * 257 + s(1).toLong) % 1000000007L))
  }

  test("RollingHashWindows rejects parameters that overflow long math") {
    // m ~ 2^61, b = 2 passed the old `m * b > 0` check but overflows
    // (byte & 0xff) * bPow in the hot loop.
    val child = org.apache.spark.sql.catalyst.expressions.Literal.create(
      "x", org.apache.spark.sql.types.StringType)
    intercept[IllegalArgumentException] {
      RollingHashWindows(child, 4, 2L, Long.MaxValue / 4)
    }
    intercept[IllegalArgumentException] {
      RollingHashWindows(child, 4, Long.MaxValue / 2, 1000000007L)
    }
  }
}
