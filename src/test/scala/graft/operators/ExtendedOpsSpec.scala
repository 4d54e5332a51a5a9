package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** The ap1/ap2 registry queries oracle-compare an error-band INDEX
  * (engine-specific sketch values can't hash-match DuckDB); this spec
  * asserts the bound on the RAW estimates, so the band itself — not just
  * its index — is verified against real sketch output.
  */
class ExtendedOpsSpec extends SparkSpec {

  test("raw HLL estimate is within 25% of exact per event type") {
    val rows = graft.Tables(spark, TestSpark.Sf0001, "events")
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id")).as("approx"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.25,
        s"${r.getString(0)}: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("raw approx_percentile is within one quantity unit of exact") {
    val rows = graft.Tables(spark, TestSpark.Sf0001, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_p50"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val diff = math.abs(r.getDouble(1) - r.get(2).asInstanceOf[Number].doubleValue)
      assert(diff <= 1.0, s"${r.getString(0)}: |approx - exact| = $diff")
    }
  }
}
