package graft.operators

import graft.{Q, Tables}
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

  /** Oracle-checked proof that salting is answer-preserving: the Spark
    * side routes the per-user event rollup through the two-phase salted
    * aggregation (events has hot users — the 100 TB skew case), while the
    * oracle is the PLAIN aggregation — identical output is the whole
    * point. The value sum uses the fixed-point convention (round(x*1e4)
    * summed as longs, one final divide) so the result is independent of
    * partition/salt-bucket addition order in both engines.
    */
  val all: Seq[Q] = Seq(
    Q(
      "st1_salted_agg",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        saltedAgg(ev, col("user_id"), saltBuckets = 16, Seq(
          (count(lit(1)), (c: String) => sum(col(c)), "n_events"),
          (sum(round(col("value") * 10000).cast("long")),
            (c: String) => sum(col(c)), "v4")))
          .select(
            col("_key").as("user_id"),
            col("n_events"),
            (col("v4").cast("double") / 10000.0).as("total_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n_events,
             |  CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS total_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)
    )
  )
}
