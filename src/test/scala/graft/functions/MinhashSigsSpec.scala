package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MinhashSigs must be bit-identical to the composable chain it
  * replaced: sig(i) = min over tokens of
  * pmod(h1 + i*h2, 2^32), where (h1, h2) are
  * conv(substring(md5(token), 1|9, 8), 16, 10) — including empty
  * tokens from repeated/trailing spaces, single-token and empty
  * strings, duplicate tokens (min-invariant), and non-ASCII bytes.
  */
class MinhashSigsSpec extends SparkSpec {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",
    "oneword",
    "",
    "trailing space ",
    " leading",
    "double  space",
    "rep rep rep rep", // duplicates cannot change a min
    "naïve café déjà vu", // multi-byte UTF-8
    "x "
  )

  test("native minhash signatures == interpreted md5 chain") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val k = 16
    val words = split(col("text"), " ")
    val hp = transform(words, t => struct(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(t), 9, 8), 16, 10).cast("long").as("h2")))
    val ref = transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hp,
        p => pmod(p.getField("h1") + i.cast("long") * p.getField("h2"),
          lit(4294967296L)))))
    val rows = cases.toDF("text")
      .select(
        call_function(GraftFunctions.MinhashName, col("text"), lit(k)).as("native"),
        ref.as("reference"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
    assert(rows.length === cases.length)
  }

  test("seen-set dedup is invisible: random corpora, table growth, heavy dups") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val k = 16
    val rnd = new scala.util.Random(42)
    // vocab large enough to force the 256-slot seen-set to grow twice;
    // docs mix heavy duplication with one-off tokens and empty tokens
    val vocab = (0 until 600).map(i => s"tok$i${"x" * (i % 5)}")
    val docs = (0 until 30).map { _ =>
      val n = 50 + rnd.nextInt(900)
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" ") + (if (rnd.nextBoolean()) "  " else "")
    }
    val words = split(col("text"), " ")
    val hp = transform(words, t => struct(
      conv(substring(md5(t), 1, 8), 16, 10).cast("long").as("h1"),
      conv(substring(md5(t), 9, 8), 16, 10).cast("long").as("h2")))
    val ref = transform(
      sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hp,
        p => pmod(p.getField("h1") + i.cast("long") * p.getField("h2"),
          lit(4294967296L)))))
    val rows = docs.toDF("text")
      .select(
        call_function(GraftFunctions.MinhashName, col("text"), lit(k)).as("native"),
        ref.as("reference"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    assert(rows.length === docs.length)
  }

  test("fused band signatures == banding the native signature column chain") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val (k, bandSize) = (104, 13)
    val numBands = k / bandSize
    // the column-level banding the fused expression replaces
    val sig = call_function(GraftFunctions.MinhashName, col("text"), lit(k))
    val ref = transform(
      sequence(lit(0), lit(numBands - 1)),
      b => conv(
        substring(
          md5(concat_ws(",",
            slice(sig, b * lit(bandSize) + lit(1), lit(bandSize)).cast("array<string>"))),
          1, 15),
        16, 10).cast("long"))
    val rows = cases.toDF("text")
      .select(
        call_function(GraftFunctions.BandSigsName,
          col("text"), lit(k), lit(bandSize), lit(1)).as("fused"),
        ref.as("reference"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    assert(rows.length === cases.length)
  }

  test("gram=2 band signatures band the bigram shingle family") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // reordering words changes bigram bands; word-set banding would not
    val df = Seq(
      ("w x y z w x y z w x y z w x y z", "same"),
      ("x w z y x w z y x w z y x w z y", "shuffled"))
      .toDF("text", "tag")
      .select(col("tag"),
        call_function(GraftFunctions.BandSigsName,
          col("text"), lit(104), lit(13), lit(2)).as("bands"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(df("same") !== df("shuffled"))
    // and identical texts agree, all 8 bands
    val twice = Seq("p q r s p q r s", "p q r s p q r s").toDF("text")
      .select(call_function(GraftFunctions.BandSigsName,
        col("text"), lit(104), lit(13), lit(2)).as("bands"))
      .collect().map(_.getSeq[Long](0))
    assert(twice(0) === twice(1))
    assert(twice(0).length === 8)
  }
}
