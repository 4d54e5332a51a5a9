package graft.functions

import graft.SparkSpec
import graft.functions.TypedAggregators.{WSum, WeightedMeanPrice}
import org.apache.spark.sql.functions._

/** The typed weighted-mean Aggregator must be exact integer arithmetic
  * under reduce/merge (associative, partition-order independent) and
  * match the plain SQL formulation through both the typed and the
  * udaf-bridged untyped API.
  */
class TypedAggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("reduce/merge are exact and associative") {
    val rows = Seq((10.01, 2.0), (0.99, 5.0), (123.45, 1.0), (7.5, 4.0))
    val seq = rows.foldLeft(WeightedMeanPrice.zero)(WeightedMeanPrice.reduce)
    // merge of arbitrary splits equals the sequential reduce
    for (cut <- 1 until rows.size) {
      val (l, r) = rows.splitAt(cut)
      val merged = WeightedMeanPrice.merge(
        l.foldLeft(WeightedMeanPrice.zero)(WeightedMeanPrice.reduce),
        r.foldLeft(WeightedMeanPrice.zero)(WeightedMeanPrice.reduce))
      assert(merged === seq)
    }
    assert(seq === WSum(1001 * 2 + 99 * 5 + 12345 + 750 * 4, 12L))
    assert(WeightedMeanPrice.finish(seq) ===
      seq.cents.toDouble / (100.0 * seq.weight))
    assert(WeightedMeanPrice.finish(WeightedMeanPrice.zero).isNaN)
  }

  test("typed column and udaf bridge agree with the SQL formulation") {
    val df = (1 to 1000)
      .map(i => (s"g${i % 3}", (i % 500) / 100.0 + 1.0, (i % 7 + 1).toDouble))
      .toDF("g", "price", "qty")
      .repartition(7)
    val wmean = udaf(WeightedMeanPrice)
    val viaUdaf = df.groupBy("g")
      .agg(wmean(col("price"), col("qty")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaSql = df.groupBy("g")
      .agg((sum(round(col("price") * 100).cast("long") * col("qty").cast("long"))
        .cast("double") /
        (lit(100.0) * sum(col("qty").cast("long")).cast("double"))).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaUdaf === viaSql)

    val typed = df.select(col("price"), col("qty")).as[(Double, Double)]
      .select(WeightedMeanPrice.toColumn).head()
    val sqlAll = df.agg(
      (sum(round(col("price") * 100).cast("long") * col("qty").cast("long"))
        .cast("double") /
        (lit(100.0) * sum(col("qty").cast("long")).cast("double"))).as("m"))
      .head().getDouble(0)
    assert(typed === sqlAll)
  }
}
