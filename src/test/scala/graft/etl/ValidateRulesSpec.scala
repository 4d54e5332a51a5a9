package graft.etl

import graft.SparkSpec
import graft.etl.Validate.Rule
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.{Seed => GenSeed}

/** Property-based coverage of the rule engine (SURVEY.md §5) using
  * ScalaCheck generators with pinned seeds: for any rule matrix and any
  * row, the report must list exactly the failed rules' messages, joined
  * in rule order, with PASS iff none failed — and a rule whose predicate
  * evaluates to NULL counts as failed.
  */
class ValidateRulesSpec extends SparkSpec {

  private val caseGen: Gen[(Int, List[Int])] =
    Gen.zip(Gen.choose(-100, 100), Gen.listOfN(4, Gen.choose(-50, 50)))

  test("issues are exactly the failed rules' messages in declaration order") {
    import spark.implicits._
    val cases = (0 until 40).map(i =>
      caseGen.pureApply(Gen.Parameters.default, GenSeed(i.toLong)))
    // one DataFrame per distinct rule matrix, all rows checked in one pass
    cases.zipWithIndex.groupBy(_._1._2).foreach { case (bounds, group) =>
      val df = group.map { case ((v, _), idx) => (idx, v) }.toDF("case_id", "x")
      val rules = bounds.zipWithIndex.map { case (b, i) => Rule(col("x") > b, s"r$i") }
      val got = Validate.report(df, "t", col("case_id"), rules)
        .collect().map(r => r.getString(1) -> (r.getString(2), r.getString(3))).toMap
      group.foreach { case ((v, _), idx) =>
        val fails = bounds.zipWithIndex.collect { case (b, i) if v <= b => s"r$i" }
        val (status, issues) = got(idx.toString)
        if (fails.isEmpty) assert((status, issues) === ("PASS", "OK"), s"v=$v bounds=$bounds")
        else assert((status, issues) === ("FAIL", fails.mkString("; ")), s"v=$v bounds=$bounds")
      }
    }
  }

  test("null rule evaluation counts as failure, not silent pass") {
    import spark.implicits._
    val df = Seq[(String, Option[Int])](("r1", None)).toDF("id", "x")
    val row = Validate.report(df, "t", col("id"),
      Seq(Rule(col("x") > 0, "x not positive"))).head()
    assert(row.getString(2) === "FAIL")
    assert(row.getString(3) === "x not positive")
  }

  test("dynamic messages interpolate the offending value") {
    import spark.implicits._
    val df = Seq("Impossible").toDF("difficulty")
    val row = Validate.report(df, "t", lit("r"),
      Seq(Rule(col("difficulty").isin("Easy", "Medium", "Hard"),
        concat(lit("Invalid difficulty: "), col("difficulty"))))).head()
    assert(row.getString(3) === "Invalid difficulty: Impossible")
  }

  test("summary tallies PASS/FAIL per table") {
    import spark.implicits._
    val df = Seq(1, -1, 2, -2, 3).toDF("x")
    val report = Validate.report(df, "nums", col("x"), Seq(Rule(col("x") > 0, "neg")))
    val sums = Validate.summary(report).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sums === Map(("nums", "PASS") -> 3L, ("nums", "FAIL") -> 2L))
  }
}
