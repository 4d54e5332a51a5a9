package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => GenSeed}

/** BandedLevenshtein must be RESULT-IDENTICAL to Spark's
  * `levenshtein(a, b, k)` (distance when ≤ k, -1 beyond): the ASCII
  * byte-band fast path is pinned against Spark's own kernel
  * property-style, edge cases by hand, and the codegen path through a
  * DataFrame — dd9 swaps this in as a pure kernel optimization, so any
  * divergence is an oracle break, not a tuning miss.
  */
class BandedLevenshteinSpec extends SparkSpec {

  private def ours(a: String, b: String, k: Int): Int =
    BandedLevenshtein.compute(
      UTF8String.fromString(a), UTF8String.fromString(b), k)

  private def sparks(a: String, b: String, k: Int): Int =
    UTF8String.fromString(a).levenshteinDistance(UTF8String.fromString(b), k)

  test("edge cases match Spark's thresholded kernel") {
    for (k <- Seq(0, 1, 2, 16)) {
      assert(ours("", "", k) === sparks("", "", k))
      assert(ours("", "abc", k) === sparks("", "abc", k))
      assert(ours("abc", "", k) === sparks("abc", "", k))
      assert(ours("abc", "abc", k) === sparks("abc", "abc", k))
      assert(ours("kitten", "sitting", k) === sparks("kitten", "sitting", k))
      assert(ours("abcdefgh", "hgfedcba", k) === sparks("abcdefgh", "hgfedcba", k))
    }
    // band edge: distance exactly k, k+1
    assert(ours("aaaa", "aabb", 2) === 2)
    assert(ours("aaaa", "abbb", 2) === -1)
    // length difference beyond k
    assert(ours("a", "a" * 20, 16) === -1)
  }

  test("property: ASCII inputs match Spark for random strings and thresholds") {
    val gen = for {
      a <- Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString)
      b <- Gen.listOf(Gen.oneOf('a', 'b', 'c', 'd', ' ')).map(_.mkString)
      k <- Gen.choose(0, 20)
    } yield (a, b, k)
    (0 until 2000).foreach { i =>
      val (a, b, k) = gen.pureApply(Gen.Parameters.default, GenSeed(i.toLong))
      assert(ours(a, b, k) === sparks(a, b, k), s"a='$a' b='$b' k=$k")
    }
  }

  test("property: 64-char word-soup prefixes (the dd9 shape) at k=16") {
    val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.listOfN(16, Gen.oneOf(words)).map(_.mkString(" ").take(64))
    (0 until 500).foreach { i =>
      val a = doc.pureApply(Gen.Parameters.default, GenSeed(i.toLong))
      val b = doc.pureApply(Gen.Parameters.default, GenSeed((i + 7919).toLong))
      assert(ours(a, b, 16) === sparks(a, b, 16), s"a='$a' b='$b'")
      assert(ours(a, a, 16) === 0)
    }
  }

  test("property: the Myers/band dispatch seam at shorter-side length 64") {
    // the bit-parallel tier handles min(|a|,|b|) <= 64; the band handles
    // the rest — straddle the seam on both sides, at thresholds around
    // the lengths, so a wrong word-boundary bit or band edge must fail
    val gen = for {
      la <- Gen.choose(58, 70)
      lb <- Gen.choose(58, 70)
      a <- Gen.listOfN(la, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
      b <- Gen.listOfN(lb, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
      k <- Gen.choose(0, 70)
    } yield (a, b, k)
    (0 until 2000).foreach { i =>
      val (a, b, k) = gen.pureApply(Gen.Parameters.default, GenSeed(1000000L + i))
      assert(ours(a, b, k) === sparks(a, b, k), s"a='$a' b='$b' k=$k")
    }
    // exactly-64 pattern: bit 63 is the score bit — exercise carry into it
    val s64 = "a" * 64
    for (k <- Seq(0, 1, 16, 64)) {
      assert(ours(s64, s64, k) === sparks(s64, s64, k))
      assert(ours(s64, "b" + s64.drop(1), k) === sparks(s64, "b" + s64.drop(1), k))
      assert(ours(s64, s64.dropRight(1) + "b", k) === sparks(s64, s64.dropRight(1) + "b", k))
      assert(ours(s64, s64 + "cdef", k) === sparks(s64, s64 + "cdef", k))
      assert(ours(s64.take(63), s64, k) === sparks(s64.take(63), s64, k))
    }
  }

  test("non-ASCII inputs delegate to Spark's kernel (parity by construction)") {
    val cases = Seq(
      ("héllo", "hello", 5), ("héllo", "héllo", 3), ("日本語", "日本誤", 2),
      ("naïve", "naive", 16), ("日本語テキスト", "abc", 3))
    cases.foreach { case (a, b, k) =>
      assert(ours(a, b, k) === sparks(a, b, k), s"a='$a' b='$b' k=$k")
      assert(ours(b, a, k) === sparks(b, a, k), s"b='$b' a='$a' k=$k")
    }
  }

  test("codegen path: DataFrame results equal Spark's levenshtein(a, b, k)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("alpha", "beta", "gamma", "delta")
    val r = new scala.util.Random(11)
    def doc() = Seq.fill(12)(words(r.nextInt(words.length))).mkString(" ").take(64)
    val df = (1 to 300).map(_ => (doc(), doc())).toSeq.toDF("a", "b")
    val got = df.select(
        call_function(GraftFunctions.LevenshteinKName, col("a"), col("b"), lit(16)).as("x"),
        levenshtein(col("a"), col("b"), 16).as("y"))
      .collect()
    got.foreach(row => assert(row.getInt(0) === row.getInt(1)))
  }
}
