package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PositionalNgramMd5Hashes must be bit-identical to the interpreted
  * chain it replaced in the dd10/sm15 scrub path:
  * transform(sequence(1, size(toks)-(n-1)),
  *   i -> conv(substring(md5(concat_ws(' ', slice(toks, i, n))), 1, 15), 16, 10))
  * over toks = split(text, ' ') — in POSITION ORDER (no sort, no
  * dedupe: the scrub expands coverage spans from the offsets), with
  * empty tokens from repeated/trailing spaces preserved, and an empty
  * array for short strings (< n tokens) where sequence(1,0) would have
  * descended into slice(toks, 0, n) and thrown.
  */
class PositionalNgramSpec extends SparkSpec {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g h", // exactly n tokens -> one window
    "a b c d e f g",   // n-1 tokens -> empty (the sequence(1,0) trap)
    "oneword",
    "",
    "w x y z p q r s t u v",
    "dup dup dup dup dup dup dup dup dup dup", // repeated grams kept, in order
    "trailing space again and more padding words here ",
    " leading space with enough tokens to window over",
    "double  space makes an empty token inside this text",
    "naïve café déjà vu résumé naïve café déjà vu" // multi-byte UTF-8
  )

  private val N = 8

  test("native positional hashes == interpreted md5 chain, window order") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = cases.toDF("text")
      .withColumn("toks", split(col("text"), " "))
    val out = df.select(
      call_function(GraftFunctions.PosNgramName, col("text"), lit(N)).as("native"),
      when(size(col("toks")) >= N,
        transform(
          sequence(lit(1), size(col("toks")) - (N - 1)),
          i => conv(substring(md5(concat_ws(" ", slice(col("toks"), i, lit(N)))), 1, 15),
            16, 10).cast("long")))
        .otherwise(typedlit(Seq.empty[Long])).as("sql"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.zip(cases).foreach { case ((native, sql), text) =>
      assert(native === sql, s"mismatch for input '$text'")
    }
  }

  test("hash is the 60-bit md5 hex prefix (known value)") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // single window: md5("a b c d e f g h") first 15 hex chars as a long
    val gram = "a b c d e f g h"
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16)
    val got = Seq(gram).toDF("text")
      .select(call_function(GraftFunctions.PosNgramName, col("text"), lit(N)))
      .as[Seq[Long]].head()
    assert(got === Seq(expected))
  }
}
