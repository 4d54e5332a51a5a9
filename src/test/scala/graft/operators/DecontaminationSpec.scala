package graft.operators

import graft.functions.GraftFunctions
import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Decontamination (dc1/dc2) invariants plus the NgramMd5Hashes
  * native-vs-interpreted equivalence it rides on.
  */
class DecontaminationSpec extends SparkSpec {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c d e", // exactly one 5-gram
    "a b c d", // fewer tokens than the window -> no grams
    "",
    "w w w w w w w", // identical windows -> one distinct gram
    "double  space splits into empty token here",
    "naïve café déjà vu encore une fois" // multi-byte UTF-8
  )

  test("native 5-gram hashes == interpreted md5 chain") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val n = 5
    val df = cases.toDF("text").withColumn("words", split(col("text"), " "))
    val out = df
      .select(
        call_function(GraftFunctions.NgramName, col("text"), lit(n)).as("native"),
        sort_array(array_distinct(
          when(
            size(col("words")) >= n,
            transform(
              sequence(lit(1), size(col("words")) - (n - 1)),
              i =>
                conv(
                  substring(
                    md5(concat_ws(" ", slice(col("words"), i, lit(n)))),
                    1, 8), 16, 10).cast("long")))
            .otherwise(typedlit(Seq.empty[Long])))).as("sql"))
      .as[(Seq[Long], Seq[Long])]
      .collect()
    out.zip(cases).foreach { case ((native, sql), text) =>
      assert(native === sql, s"mismatch for input '$text'")
    }
  }

  test("ngram n=2 agrees with the dedicated bigram expression") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val out = cases.toDF("text")
      .select(
        call_function(GraftFunctions.NgramName, col("text"), lit(2)).as("n2"),
        call_function(GraftFunctions.BigramName, col("text")).as("bg"))
      .as[(Seq[Long], Seq[Long])]
      .collect()
    out.foreach { case (n2, bg) => assert(n2 === bg) }
  }

  test("dc1/dc2 are consistent: flags, bounds, and the clean-set complement") {
    val dir = TestSpark.Sf0001
    val dc1 = graft.SparkEntry.queries("dc1_contamination")(spark, dir).collect()
    assert(dc1.nonEmpty)
    dc1.foreach { r =>
      val (nGrams, nCont, flag) =
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_contaminated"),
          r.getAs[Boolean]("contaminated"))
      assert(nCont <= nGrams)
      assert(flag === (nCont > 0))
    }

    // clean set = (all test docs) minus (docs dc1 flags contaminated);
    // docs with <5 words carry no grams, are absent from dc1, and clean.
    val testDocs = Sampling
      .hashSplit(
        graft.Tables(spark, dir, "documents").select("doc_id"), col("doc_id"))
      .filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val flagged = dc1.filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    val clean = graft.SparkEntry.queries("dc2_clean_testset")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(clean === (testDocs -- flagged))
    assert(dc1.map(_.getAs[Long]("doc_id")).toSet.subsetOf(testDocs))
  }
}
