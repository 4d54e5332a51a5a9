package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees under partitioned (merge-exercising)
  * execution: never undercounts, bounded overcount, counter mass
  * conservation, and bucket-formula parity with the SQL-oracle idiom.
  */
class CountMinSpec extends SparkSpec {

  private val D = 4
  private val W = 64

  private def sketch(items: Seq[String], parts: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    items.toDF("x").repartition(parts)
      .agg(call_function(GraftFunctions.CountMinName, col("x"), lit(D), lit(W)))
      .head().getSeq[Long](0)
  }

  private def probe(cm: Seq[Long], item: String): Long =
    (0 until D).map(i => cm(i * W + CountMinLongs.bucket(item, i, W))).min

  // skewed stream: two heavy items + modest distinct tail
  private val stream: Seq[String] =
    Seq.fill(200)("hot") ++ Seq.fill(50)("warm") ++ (0 until 100).map("t" + _)

  test("estimates never undercount and respect the 2N/w overcount bound") {
    val n = stream.size
    for (parts <- Seq(1, 3, 7)) {
      val cm = sketch(stream, parts)
      assert(cm.length === D * W)
      // each row holds exactly N total mass
      (0 until D).foreach { i =>
        assert(cm.slice(i * W, (i + 1) * W).sum === n.toLong, s"row $i mass")
      }
      for ((item, truth) <- Seq("hot" -> 200L, "warm" -> 50L, "t5" -> 1L, "t99" -> 1L)) {
        val est = probe(cm, item)
        assert(est >= truth, s"undercount for $item: $est < $truth")
        assert(est <= truth + 2L * n / W,
          s"overcount beyond 2N/w for $item: $est > $truth + ${2 * n / W}")
      }
      // absent item: min over rows still bounded by collision mass
      assert(probe(cm, "never-seen") <= 2L * n / W)
    }
  }

  test("merge equals single-partition build (exact associativity)") {
    assert(sketch(stream, 7) === sketch(stream, 1))
  }

  test("bucket formula matches the SQL-oracle md5-slice idiom") {
    // the oracle computes CAST('0x'||substr(md5(x),1+8i,8) AS BIGINT) % w;
    // recompute via an independent md5 here
    val md = java.security.MessageDigest.getInstance("MD5")
    for (item <- Seq("0", "42", "hot", "日本語")) {
      val hex = md.digest(item.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      md.reset()
      (0 until D).foreach { i =>
        val expected = (java.lang.Long.parseLong(hex.substring(8 * i, 8 * i + 8), 16) % W).toInt
        assert(CountMinLongs.bucket(item, i, W) === expected, s"$item row $i")
      }
    }
  }
}
