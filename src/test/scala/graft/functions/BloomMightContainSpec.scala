package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom probe's contract: zero false negatives (that is what makes
  * the exact confirm join sound), a usefully low false-positive rate,
  * and null passthrough.
  */
class BloomMightContainSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives; false-positive rate near the requested fpp") {
    GraftFunctions.register(spark)
    val members = spark.range(10000).select((col("id") * 7 + 3).as("g"))
    val bloom = BloomMightContainLong.serializedBloom(members, "g", fpp = 0.03)

    val hits = members
      .filter(call_function(GraftFunctions.BloomName, col("g"), lit(bloom)))
      .count()
    assert(hits === 10000L, "a member must never be filtered out")

    // disjoint probe range: [10^9, 10^9 + 10^5)
    val probes = 100000L
    val fp = spark.range(1000000000L, 1000000000L + probes)
      .filter(call_function(GraftFunctions.BloomName, col("id"), lit(bloom)))
      .count()
    assert(fp < probes * 0.06, s"fp rate ${fp.toDouble / probes} far above fpp")
  }

  test("stays inside whole-stage codegen (doGenCode path, not interpreted eval)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bloom = BloomMightContainLong.serializedBloom(Seq(1L, 2L).toDF("g"), "g")
    // range source, not a local Seq — ConvertToLocalRelation would
    // constant-fold a local relation away and leave no codegen stage
    val df = spark.range(10)
      .filter(call_function(GraftFunctions.BloomName, col("id"), lit(bloom)))
    val gen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(gen.contains("mightContainLong"),
      s"expression not in generated code:\n${gen.take(800)}")
  }

  test("null input yields null, not a match") {
    GraftFunctions.register(spark)
    val bloom = BloomMightContainLong.serializedBloom(
      Seq(1L, 2L, 3L).toDF("g"), "g")
    val out = Seq(Some(1L), None).toDF("g")
      .select(call_function(GraftFunctions.BloomName, col("g"), lit(bloom)))
      .collect().map(r => if (r.isNullAt(0)) null else r.getBoolean(0))
    assert(out.toSeq === Seq(true, null))
  }
}
