package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CharNgrams must equal the interpreted substr chain it replaces —
  * including on multi-byte UTF-8, where byte slicing (instead of
  * character slicing) would split code points.
  */
class CharNgramsSpec extends SparkSpec {

  private val cases = Seq(
    "abcdef",
    "ab", // shorter than the window
    "abc", // exactly one gram
    "",
    "a a a", // repeats
    "naïve café déjà vu", // 2-byte code points
    "汉字漢字试験テスト", // 3-byte code points
    "x😀y😀z" // 4-byte (surrogate-pair) code points
  )

  test("native char n-grams == substr chain, n in 1..4") {
    GraftFunctions.register(spark)
    import spark.implicits._
    for (n <- 1 to 4) {
      val df = cases.toDF("text").select(
        call_function(GraftFunctions.CharNgramsName, col("text"), lit(n)).as("native"),
        when(
          length(col("text")) >= n,
          transform(
            sequence(lit(1), length(col("text")) - (n - 1)),
            i => col("text").substr(i, lit(n))))
          .otherwise(array().cast("array<string>")).as("sql"))
      df.as[(Seq[String], Seq[String])].collect().zip(cases).foreach {
        case ((native, sql), text) =>
          assert(native === sql, s"n=$n input '$text'")
      }
    }
  }
}
