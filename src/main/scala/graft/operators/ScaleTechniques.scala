package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable scale techniques the 100 TB deployment leans on, packaged so
  * plans can be asserted in tests (ScaleTechniquesSpec) and reused by
  * operators:
  *
  *   - salted two-phase aggregation for skewed grouping keys;
  *   - bucketed table writes for shuffle-free co-located joins;
  *   - partitioned layouts for partition-pruned scans.
  */
object ScaleTechniques {

  /** Two-phase salted aggregation: COUNT/SUM grouped by a skewed key.
    * Phase 1 groups by (key, salt) — the hot key's rows spread over
    * `saltBuckets` reducers instead of one; phase 2 merges the partials
    * by key. Exactly equal to the direct aggregation for any
    * sum/count-style (commutative, associative) aggregate.
    *
    * @param aggs (partialExpr, mergeExpr, name): phase-1 aggregate and
    *             the phase-2 merge over the partial column of that name.
    */
  def saltedAgg(
      df: DataFrame,
      key: Column,
      saltBuckets: Int,
      aggs: Seq[(Column, String => Column, String)]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy(key.as("_key"), col("_salt"))
      .agg(aggs.head._1.as(aggs.head._3), aggs.tail.map(a => a._1.as(a._3)): _*)
    phase1
      .groupBy(col("_key"))
      .agg(
        aggs.head._2(aggs.head._3).as(aggs.head._3),
        aggs.tail.map(a => a._2(a._3).as(a._3)): _*)
  }

  /** Convenience: salted count per key. */
  def saltedCount(df: DataFrame, key: Column, saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, key, saltBuckets,
      Seq((count(lit(1)), (c: String) => sum(col(c)), "n")))
}
