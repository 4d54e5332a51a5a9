package graft.operators

import graft.SparkSpec
import graft.recipes.Normalize
import org.apache.spark.sql.functions._

/** Explode-ordinal semantics (SURVEY.md §2.3): 1-based dense ordinals
  * carried from array position, order preservation, and empty/null-array
  * behavior — independent of fixtures and partitioning.
  */
class ExplodeOrdinalSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    ("r1", Seq("alpha", "beta", "gamma")),
    ("r2", Seq("solo")),
    ("r3", Seq.empty[String]),
    ("r4", null)
  ).toDF("recipe_id", "steps")

  test("posexplode yields 1-based ordinals preserving array order") {
    val out = Normalize.steps(docs).orderBy("recipe_id", "step_number")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
    assert(out === Seq(
      ("r1", 1, "alpha"), ("r1", 2, "beta"), ("r1", 3, "gamma"),
      ("r2", 1, "solo")))
  }

  test("empty and null arrays produce no rows (inner explode semantics)") {
    assert(Normalize.steps(docs).filter("recipe_id IN ('r3','r4')").count() === 0)
  }

  test("ordinals survive repartitioning (order is data-carried, not physical)") {
    val shuffled = Normalize.steps(docs.repartition(7))
      .filter("recipe_id = 'r1'")
      .orderBy("step_number")
      .select("instruction")
      .collect().map(_.getString(0)).toSeq
    assert(shuffled === Seq("alpha", "beta", "gamma"))
  }

  test("struct explode flattens fields with parent key carried") {
    val nested = Seq(("r1", Seq(("Salt", 1.0, "tbsp"), ("Rice", 250.0, "grams"))))
      .toDF("recipe_id", "ingredients")
      .withColumn("ingredients",
        col("ingredients").cast("array<struct<name:string,quantity:double,unit:string>>"))
    val out = Normalize.ingredients(nested).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq
    assert(out === Seq(("r1", "Salt", 1.0, "tbsp"), ("r1", "Rice", 250.0, "grams")))
  }
}
