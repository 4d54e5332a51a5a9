package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical and operational properties of the weighted sampler that
  * the driver's exact-oracle row can't express: weights actually bias
  * selection, and membership is partitioning-invariant.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  /** sp5's key, inlined for arbitrary weight columns. */
  private def pick(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val u = (conv(
      substring(md5(concat(lit("wrs:"), col("id").cast("string"))), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    val key = -log(u) / col("w")
    df.select(col("id"), key.as("key"))
      .withColumn("rk", row_number().over(Window.orderBy("key", "id")))
      .filter(col("rk") <= k)
  }

  test("weights bias selection: 10x-weighted minority dominates the sample") {
    // 100 heavy (w=10) vs 900 light (w=1): expected heavy share of a
    // 100-doc sample is ~10/19; unweighted it would be ~10%.
    val docs = spark.range(1000)
      .select(col("id"), when(col("id") < 100, 10.0).otherwise(1.0).as("w"))
    val heavy = pick(docs, 100).filter(col("id") < 100).count()
    assert(heavy > 30, s"heavy docs barely sampled: $heavy/100")
  }

  test("membership is partitioning-invariant") {
    val docs = spark.range(1000)
      .select(col("id"), (col("id") % 7 + 1).cast("double").as("w"))
    val a = pick(docs, 50).select("id").as[Long].collect().toSet
    val b = pick(docs.repartition(13), 50).select("id").as[Long].collect().toSet
    assert(a === b)
  }
}
