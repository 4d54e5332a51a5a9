package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => GenSeed}

/** Properties of the Morton interleave behind lk3 (pinned-seed
  * ScalaCheck inputs, evaluated through the real Column expression):
  * invertibility (no two grid cells share a z), and block locality (a
  * z-range prefix pins a rectangle in (x, y) — the property that makes
  * footer min/max skipping work on both dimensions).
  */
class ZOrderPropertySpec extends SparkSpec {

  test("interleave is invertible and prefix-local on the 256x256 grid") {
    import spark.implicits._
    val pairs = (0 until 300).map { i =>
      Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L))
        .pureApply(Gen.Parameters.default, GenSeed(i.toLong))
    }.distinct
    val got = pairs.toDF("x", "y")
      .withColumn("z", LakeMaintenance.zValue(col("x"), col("y"), 8))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      val xd = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yd = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert((xd, yd) === (x, y), s"de-interleave mismatch for z=$z")
      // top 2 z bits = (y MSB, x MSB): a z quartile is an (x, y) quadrant
      assert((z >> 14) === (((y >> 7) << 1) | (x >> 7)), s"prefix locality for z=$z")
    }
    assert(got.map(_._3).distinct.length === got.length, "z collision")
  }
}
