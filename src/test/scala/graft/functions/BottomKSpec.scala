package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The KMV bottom-k aggregate: correct sketch contents under heavy
  * partitioning (exercises update + partition-merge + serde paths),
  * dedup semantics, and estimate quality.
  */
class BottomKSpec extends SparkSpec {

  test("sketch holds the k smallest distinct values regardless of partitioning") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // values 0..999 each appearing 3 times, scattered over 23 partitions
    val df = (0 until 3).flatMap(_ => 0 until 1000).toDF("v")
      .repartition(23)
      .select(col("v").cast("long").as("v"))
    val sketch = df.agg(call_function(GraftFunctions.BottomKName, col("v"), lit(16)))
      .head().getSeq[Long](0)
    assert(sketch === (0L until 16L))
  }

  test("fewer distinct values than k: the sketch is the exact distinct set") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val sketch = Seq(5L, 1L, 5L, 9L, 1L).toDF("v")
      .agg(call_function(GraftFunctions.BottomKName, col("v"), lit(16)))
      .head().getSeq[Long](0)
    assert(sketch === Seq(1L, 5L, 9L))
  }

  test("KMV estimate lands within 3 standard errors on uniform hashes") {
    GraftFunctions.register(spark)
    val k = 64
    val n = 5000
    val df = spark.range(n).select(
      conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
        .cast("long").as("h"))
    val sketch = df.agg(call_function(GraftFunctions.BottomKName, col("h"), lit(k)))
      .head().getSeq[Long](0)
    assert(sketch.length === k)
    val est = (k - 1).toDouble * 4294967296.0 / sketch(k - 1)
    val se = n / math.sqrt(k - 2.0)
    assert(math.abs(est - n) <= 3 * se, s"estimate $est vs $n (se=$se)")
  }
}
