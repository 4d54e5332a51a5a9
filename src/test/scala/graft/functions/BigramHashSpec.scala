package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BigramMd5Hashes must be bit-identical to the SQL chain it replaced:
  * sort_array(array_distinct(transform(sequence(1, size(words)-1),
  *   i -> conv(substring(md5(words[i] || ' ' || words[i+1]), 1, 8), 16, 10))))
  * over words = split(text, ' ') — including empty tokens from repeated
  * or trailing spaces, single-word/empty strings, and non-ASCII bytes.
  */
class BigramHashSpec extends SparkSpec {

  private val cases = Seq(
    "the quick brown fox",
    "a b",
    "oneword",
    "",
    "trailing space ",
    " leading",
    "double  space",
    "a a a a", // duplicate shingles -> distinct
    "naïve café déjà vu", // multi-byte UTF-8
    "tab\tis not a separator here",
    "x " // single token + trailing empty
  )

  test("native bigram hashes == interpreted md5 chain") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = cases.toDF("text")
      .withColumn("words", split(col("text"), " "))
    val out = df.select(
      call_function(GraftFunctions.BigramName, col("text")).as("native"),
      sort_array(array_distinct(
        when(size(col("words")) >= 2,
          transform(
            sequence(lit(1), size(col("words")) - 1),
            i => conv(substring(md5(concat(
              element_at(col("words"), i), lit(" "),
              element_at(col("words"), i + 1))), 1, 8), 16, 10).cast("long")))
          .otherwise(typedlit(Seq.empty[Long])))).as("sql"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.zip(cases).foreach { case ((native, sql), text) =>
      assert(native === sql, s"mismatch for input '$text'")
    }
  }
}
