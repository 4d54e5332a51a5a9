package graft.recipes

import graft.SparkSpec

/** The deterministic seed generator must reproduce the reference's golden
  * corpus shape (src/insert_recipe.py seeded 11 users / 20 recipes / 50
  * interactions → 120 ingredient rows / 65 step rows) and its
  * distributional contracts (3:2:1 type weighting, ~30% ratings).
  */
class SeedSpec extends SparkSpec {

  private lazy val (users, recipes, interactions) = Seed.seedDocuments(spark)
  private lazy val star = Normalize.normalize(users, recipes, interactions)

  test("golden row counts: 11 users, 20 recipes, 120 ingredients, 65 steps, 50 interactions") {
    assert(star("users").count() === 11)
    assert(star("recipes").count() === 20)
    assert(star("ingredients").count() === 120)
    assert(star("steps").count() === 65)
    assert(star("interactions").count() === 50)
  }

  test("generation is deterministic across runs") {
    val again = Seed.recipes(spark)
    assert(rowSet(CsvIO.stringified(Normalize.ingredients(again)))
      === rowSet(CsvIO.stringified(star("ingredients"))))
  }

  test("ingredient counts stay in the reference's 3..8 range") {
    import org.apache.spark.sql.functions._
    val counts = star("ingredients").groupBy("recipe_id").count()
      .filter(col("recipe_id") =!= "rec_001_saurav_chicken_gravy")
    assert(counts.filter("count < 3 OR count > 8").count() === 0)
    assert(counts.count() === 19)
  }

  test("interaction types follow the weighted pool; ratings ~30% non-null from {3,4,5}") {
    val ia = star("interactions").cache()
    val types = ia.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3:2:1 pool over 50 draws — views must dominate, all three present
    assert(types.keySet === Set("view", "like", "cook_attempt"))
    assert(types("view") > types("like") && types("like") > types("cook_attempt"))
    val rated = ia.filter("rating IS NOT NULL")
    assert(rated.count() > 5 && rated.count() < 25) // ~30% of 50
    assert(rated.filter("rating NOT IN (3,4,5)").count() === 0)
  }

  test("ids follow the reference templates") {
    assert(star("recipes").filter(
      "recipe_id NOT RLIKE '^rec_[0-9]{3}_(synthetic|saurav_chicken_gravy)$'").count() === 0)
    assert(star("interactions").filter(
      "interaction_id NOT RLIKE '^int_[0-9]{4}$'").count() === 0)
  }

  test("generator scales: 100× recipe count keeps shape and determinism") {
    val big = Seed.syntheticRecipes(spark, 1900)
    assert(big.count() === 1900)
    val ing = Normalize.ingredients(big)
    val perRecipe = ing.groupBy("recipe_id").count()
    assert(perRecipe.filter("count < 3 OR count > 8").count() === 0)
    // ids remain unique at scale (the hash-derived fields never collide on id)
    assert(big.select("recipe_id").distinct().count() === 1900)
  }

  test("seeded documents normalize + validate 100% clean") {
    val asStrings = star.map { case (k, v) => k -> CsvIO.stringified(v) }
    val report = RecipeValidation.validateAll(asStrings)
    assert(report.count() === 266)
    assert(report.filter("Status = 'FAIL'").count() === 0)
  }
}
